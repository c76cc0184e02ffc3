"""Checkpoint round-trip, pruning, partial restore, torch conversion."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rvos_tpu.engine.checkpoint import (
    _flatten,
    convert_torch_statedict,
    list_checkpoint_steps,
    partial_restore,
    restore_checkpoint,
    save_checkpoint,
)
from rvos_tpu.engine.train import TrainState


def _small_state(rng):
    params = {"a": {"w": rng.standard_normal((3, 4)).astype(np.float32)},
              "b": {"bias": rng.standard_normal((4,)).astype(np.float32)}}
    return TrainState(params=jax.tree.map(jnp.asarray, params),
                      opt_state={"mom": jnp.zeros((3, 4))},
                      step=jnp.asarray(7))


def test_save_restore_roundtrip(tmp_path, rng):
    st = _small_state(rng)
    save_checkpoint(str(tmp_path), 7, st, max_keep=2)
    assert list_checkpoint_steps(str(tmp_path)) == [7]
    restored, step = restore_checkpoint(str(tmp_path), None, st)
    assert step == 7
    np.testing.assert_allclose(np.asarray(restored.params["a"]["w"]),
                               np.asarray(st.params["a"]["w"]))


def test_prune_max_keep(tmp_path, rng):
    st = _small_state(rng)
    for s in (2, 4, 6, 8):
        save_checkpoint(str(tmp_path), s, st, max_keep=2)
    assert list_checkpoint_steps(str(tmp_path)) == [6, 8]


def test_partial_restore_shape_check(rng):
    params = {"m": {"kernel": jnp.zeros((3, 3)), "bias": jnp.zeros((3,))}}
    loaded = {"m/kernel": np.ones((3, 3), np.float32),
              "m/bias": np.ones((5,), np.float32),        # mismatched
              "ghost/x": np.ones((1,), np.float32)}       # missing
    merged, removed = partial_restore(params, loaded)
    np.testing.assert_allclose(np.asarray(merged["m"]["kernel"]), 1.0)
    np.testing.assert_allclose(np.asarray(merged["m"]["bias"]), 0.0)
    assert set(removed) == {"m/bias", "ghost/x"}


def test_torch_conversion_backbone_keys(rng):
    sd = {
        "module.feature_extracter.backbone.conv1.weight":
            rng.standard_normal((64, 3, 7, 7)).astype(np.float32),
        "feature_extracter.backbone.bn1.running_mean":
            rng.standard_normal((64,)).astype(np.float32),
        "feature_extracter.backbone.layer1.0.conv2.weight":
            rng.standard_normal((64, 64, 3, 3)).astype(np.float32),
        "feature_extracter.backbone.layer1.0.downsample.0.weight":
            rng.standard_normal((256, 64, 1, 1)).astype(np.float32),
        "feature_extracter.backbone.layer1.0.downsample.1.running_var":
            rng.standard_normal((256,)).astype(np.float32),
        "feature_extracter.backbone.bn1.num_batches_tracked": np.zeros(()),
    }
    sd["dynamic_seghead.layer1.GCT1.alpha"] = \
        rng.standard_normal((1, 164, 1, 1)).astype(np.float32)
    sd["dynamic_seghead.IA1.IA.weight"] = \
        rng.standard_normal((164, 400)).astype(np.float32)
    sd["dynamic_seghead.layer1.bn1.weight"] = \
        rng.standard_normal((64,)).astype(np.float32)
    out = convert_torch_statedict(sd)
    assert out["feature_extracter/backbone/conv1/kernel"].shape == (7, 7, 3, 64)
    assert "feature_extracter/backbone/bn1/running_mean" in out
    assert out["feature_extracter/backbone/layer1_0/conv2/kernel"
               ].shape == (3, 3, 64, 64)
    assert out["feature_extracter/backbone/layer1_0/downsample_conv/kernel"
               ].shape == (1, 1, 64, 256)
    assert "feature_extracter/backbone/layer1_0/downsample_bn/running_var" in out
    assert not any("num_batches" in k for k in out)
    # GCT params transposed to NHWC
    assert out["dynamic_seghead/layer1/GCT1/alpha"].shape == (1, 1, 1, 164)
    # dense kernels transposed
    assert out["dynamic_seghead/IA1/IA/kernel"].shape == (400, 164)
    # GroupNorm weight outside the extractor becomes flax 'scale'
    assert "dynamic_seghead/layer1/bn1/scale" in out
