"""Forward numerical parity vs an independent fixed-semantics torch oracle.

SURVEY §7/M2's "bit-level target": random flax weights are mapped through
``_torchify`` (the inverse of the production torch→flax converter) into a
reference-style state dict, and ``tests/torch_oracle.py`` — an independent
functional torch implementation of ``forward_for_eval`` — must compute the
same function as ``AOCNet.full_forward``: backbone, all five matching
streams, and the calibration decoder, compared stream-by-stream and at the
final logits (VERDICT r2 missing #1).

The k-means stream shares only its PRNG draws (the uniform init scores)
between the two sides — the Lloyd iterations themselves are computed
independently (``ops/kmeans.py`` vs ``torch_oracle.kmeans_banks``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvos_tpu.configs import tiny_test
from rvos_tpu.engine.checkpoint import _flatten
from rvos_tpu.models import AOCNet
from rvos_tpu.models.aocnet import init_model

from test_checkpoint import _torchify
from torch_oracle import torch_full_forward


def _rel(a, b):
    return np.max(np.abs(a - b) / np.maximum(np.abs(b), 1.0))


@pytest.mark.slow
def test_torch_forward_parity(rng):
    cfg = tiny_test(MODEL_MULTI_LOCAL_DISTANCE=(2, 4), MODEL_MAX_OBJ_NUM=3,
                    USE_PALLAS=False, MATCHING_MAX_REF_PIXELS=0,
                    MATCHING_DTYPE="float32", MODEL_CLUSTER_NUM=4,
                    MODEL_KMEANS_ITERS=4)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (65, 65))

    imgs = rng.standard_normal((3, 65, 65, 3)).astype(np.float32)
    jimgs = jnp.asarray(imgs)

    emb, low = jax.jit(
        lambda v, x: model.apply(v, x, method=AOCNet.extract_feature)
    )(variables, jimgs)
    h, w = emb.shape[1], emb.shape[2]
    labels = np.zeros((h, w), np.int32)
    labels[2:8, 3:9] = 1
    labels[10:15, 5:12] = 2

    logits = np.asarray(jax.jit(
        lambda v, x, l: model.apply(v, x, l, method=AOCNet.full_forward)
    )(variables, jimgs, jnp.asarray(labels)))

    # the only shared state: the k-means init draws (full_forward passes
    # kmeans_key=PRNGKey(0); cluster_objects splits it per object)
    o = cfg.MODEL_MAX_OBJ_NUM
    keys = jax.random.split(jax.random.PRNGKey(0), o)
    uniforms = np.stack([
        np.asarray(jax.random.uniform(k, (h * w,), minval=0.5, maxval=1.0))
        for k in keys])

    sd = _torchify(_flatten(jax.device_get(variables["params"])))
    out = torch_full_forward(sd, imgs, labels, cfg, uniforms)

    # backbone + semantic embedding
    np.testing.assert_allclose(out["emb"].transpose(0, 2, 3, 1),
                               np.asarray(emb), atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out["low"].transpose(0, 2, 3, 1),
                               np.asarray(low), atol=2e-4, rtol=1e-3)

    # matching streams, computed exactly as segment_frame computes them
    from rvos_tpu.ops import (attention_heads, cluster_matching,
                              cluster_objects, local_matching_bank_stacked,
                              proxy_matching, proxy_reconstructed_embedding)
    from rvos_tpu.ops.matching import global_matching_flat

    onehot = jax.nn.one_hot(jnp.asarray(labels), o, dtype=jnp.float32)
    params = variables["params"]
    bias = jnp.concatenate([params["bg_bias"],
                            jnp.broadcast_to(params["fg_bias"], (o - 1,))])
    flat_emb = emb[0].reshape(-1, emb.shape[-1])
    flat_lab = onehot.reshape(-1, o)

    j_global = np.asarray(global_matching_flat(emb[2], flat_emb, flat_lab,
                                               bias))
    np.testing.assert_allclose(out["global_fg"], j_global, atol=1e-4)

    banks = cluster_objects(flat_emb, flat_lab, jax.random.PRNGKey(0),
                            k=cfg.MODEL_CLUSTER_NUM,
                            iters=cfg.MODEL_KMEANS_ITERS)
    j_cluster = np.asarray(cluster_matching(emb[2], banks, bias))
    np.testing.assert_allclose(out["global_cluster"], j_cluster, atol=1e-4)

    heads = attention_heads(emb[0][None], onehot[None], jnp.ones((1,)),
                            emb[1], onehot, cfg.MODEL_EPSILON)
    np.testing.assert_allclose(out["head"], np.asarray(heads.total_head),
                               atol=1e-4)
    j_proxy = np.asarray(proxy_matching(emb[2], heads.ref_pos, bias))
    np.testing.assert_allclose(out["global_proxy"], j_proxy, atol=1e-4)

    prev_inst = proxy_reconstructed_embedding(onehot, heads.prev_pos)
    local_pair = np.asarray(local_matching_bank_stacked(
        emb[2], jnp.stack([emb[1], prev_inst]), onehot, bias,
        cfg.MODEL_MULTI_LOCAL_DISTANCE,
        atrous_rate=cfg.TEST_LOCAL_ATROUS_RATE,
        allow_downsample=cfg.MODEL_LOCAL_DOWNSAMPLE))
    np.testing.assert_allclose(out["local_fg"], local_pair[0], atol=1e-4)
    np.testing.assert_allclose(out["local_proxy"], local_pair[1], atol=1e-4)

    # final logits through the full calibration decoder
    diff = np.max(np.abs(out["logits"] - logits))
    print(f"torch-parity: logits max abs diff {diff:.2e}, "
          f"max rel {_rel(out['logits'], logits):.2e}")
    assert diff < 1e-2, diff
    # prediction-level agreement
    assert (out["logits"].argmax(0) == logits.argmax(0)).mean() > 0.999
