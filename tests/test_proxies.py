"""Attention heads vs a direct oracle of the reference formulas
(attention.py:79-189)."""

import numpy as np
import jax.numpy as jnp

from rvos_tpu.ops.entropy import shannon_entropy
from rvos_tpu.ops.proxies import attention_heads, proxy_reconstructed_embedding

EPS = 1e-5


def _oracle_pos_neg(embs, labs):
    """embs: list of [H,W,C]; labs: list of [H,W,O] — eval-style summed."""
    o = labs[0].shape[-1]
    c = embs[0].shape[-1]
    pos_sum = np.zeros((o, c)); neg_sum = np.zeros((o, c))
    pos_num = np.zeros((o, 1)); neg_num = np.zeros((o, 1))
    for e, l in zip(embs, labs):
        for oo in range(o):
            m = l[..., oo:oo + 1]
            pos_sum[oo] += (e * m).sum((0, 1))
            neg_sum[oo] += (e * (1 - m)).sum((0, 1))
            pos_num[oo] += m.sum()
            neg_num[oo] += (1 - m).sum()
    return pos_sum / (pos_num + EPS), neg_sum / (neg_num + EPS)


def test_attention_heads_match_oracle(rng):
    s, h, w, c, o = 2, 6, 7, 5, 3
    refs = rng.standard_normal((s, h, w, c)).astype(np.float32)
    labs = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(s, h, w))]
    prev = rng.standard_normal((h, w, c)).astype(np.float32)
    plab = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(h, w))]

    heads = attention_heads(jnp.asarray(refs), jnp.asarray(labs),
                            jnp.ones((s,)), jnp.asarray(prev),
                            jnp.asarray(plab), EPS)

    rp, rn = _oracle_pos_neg(list(refs), list(labs))
    pp, pn = _oracle_pos_neg([prev], [plab])
    np.testing.assert_allclose(np.asarray(heads.ref_pos), rp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(heads.ref_neg), rn, atol=1e-4)
    np.testing.assert_allclose(np.asarray(heads.prev_pos), pp, atol=1e-4)
    np.testing.assert_allclose(np.asarray(heads.prev_neg), pn, atol=1e-4)
    total = np.concatenate([rp, rn, pp, pn], axis=1)
    np.testing.assert_allclose(np.asarray(heads.total_head), total, atol=1e-4)


def test_attention_heads_slot_mask(rng):
    s, h, w, c, o = 3, 5, 5, 4, 2
    refs = rng.standard_normal((s, h, w, c)).astype(np.float32)
    labs = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(s, h, w))]
    prev = rng.standard_normal((h, w, c)).astype(np.float32)
    plab = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(h, w))]
    got = attention_heads(jnp.asarray(refs), jnp.asarray(labs),
                          jnp.asarray([1.0, 1.0, 0.0]), jnp.asarray(prev),
                          jnp.asarray(plab), EPS)
    want = attention_heads(jnp.asarray(refs[:2]), jnp.asarray(labs[:2]),
                           jnp.ones((2,)), jnp.asarray(prev),
                           jnp.asarray(plab), EPS)
    np.testing.assert_allclose(np.asarray(got.total_head),
                               np.asarray(want.total_head), atol=1e-5)


def test_proxy_reconstruction(rng):
    h, w, o, c = 4, 5, 3, 6
    lab = np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(h, w))]
    prox = rng.standard_normal((o, c)).astype(np.float32)
    got = np.asarray(proxy_reconstructed_embedding(jnp.asarray(lab),
                                                   jnp.asarray(prox)))
    ids = lab.argmax(-1)
    np.testing.assert_allclose(got, prox[ids], atol=1e-6)


def test_shannon_entropy_class_mask(rng):
    o, h, w = 4, 5, 6
    p = rng.uniform(0.01, 1.0, size=(o, h, w)).astype(np.float32)
    mask = np.array([1, 1, 0, 1], np.float32)
    got = np.asarray(shannon_entropy(jnp.asarray(p), jnp.asarray(mask)))
    sub = p[[0, 1, 3]]
    want = -(sub * np.log(sub + 1e-6)).sum(0)
    np.testing.assert_allclose(got, want, atol=1e-4)
