"""On-device masked k-means for the adaptive-object-proxy (AOP) path.

The reference clusters each object's foreground reference pixels with
SciPy's CPU ``kmeans2(k=16, minit='points', iter=20)`` behind a
``.detach().cpu().numpy()`` sync (``matching.py:289-307``) and a
``try/except`` degraded fallback (``matching.py:561-595``) — the single
worst TPU-hostile pattern in the codebase.

TPU-native reformulation:

* fixed k and fixed iteration count (static shapes, no host sync);
* 'points' init replaced by a deterministic weighted top-k draw: each
  pixel gets a pseudo-random score, masked by the object's foreground
  weight; the k best scores pick k distinct foreground pixels.  Objects
  with fewer than k foreground pixels get invalid trailing centroids
  (the reference shrinks k instead — same effective bank, expressed as
  a validity mask);
* Lloyd iterations as two matmuls (assignment distances + grouped
  means), vmapped over the object axis;
* two result banks exactly like ``_chunks_cluster2`` (``:590-591``):
  the final centroids (including stale empties — SciPy keeps the old
  centroid for an empty cluster) and the final-assignment cluster
  means (empties excluded via the validity mask).

Clustering is nondeterministic across implementations, so parity with
the reference is statistical (validated at the J&F level); the proxy,
global and local streams are the bitwise-checked ones.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ClusterBanks(NamedTuple):
    centroids: jnp.ndarray     # [O, K, C]
    cent_valid: jnp.ndarray    # [O, K] bool — centroid was initialized from a fg pixel
    means: jnp.ndarray         # [O, K, C]
    mean_valid: jnp.ndarray    # [O, K] bool — cluster non-empty at final assignment


def _masked_kmeans_single(points, weights, key, k, iters, mixed=False):
    """k-means over ``points`` [R, C] with 0/1 ``weights`` [R]."""
    r, c = points.shape
    pts32 = points.astype(jnp.float32)
    pts_d = pts32.astype(jnp.bfloat16) if mixed else pts32

    # deterministic 'points' init: top-k random scores among fg pixels
    scores = jax.random.uniform(key, (r,), minval=0.5, maxval=1.0) * weights
    top_scores, top_idx = jax.lax.top_k(scores, k)
    init_valid = top_scores > 0.0                                  # [K]
    centroids = pts32[top_idx]                                     # [K, C]

    w = weights.astype(jnp.float32)

    def assign(cent, cent_ok):
        # [R, K] squared distances; invalid centroids pushed away
        p2 = jnp.sum(jnp.square(pts32), axis=-1, keepdims=True)
        c2 = jnp.sum(jnp.square(cent), axis=-1)
        cent_d = cent.astype(jnp.bfloat16) if mixed else cent
        d = p2 + c2[None, :] - 2.0 * jnp.dot(pts_d, cent_d.T,
                                             preferred_element_type=jnp.float32,
                                             precision=jax.lax.Precision.HIGHEST)
        d = jnp.where(cent_ok[None, :], d, jnp.inf)
        lab = jnp.argmin(d, axis=-1)                               # [R]
        onehot = jax.nn.one_hot(lab, k, dtype=jnp.float32) * w[:, None]
        return onehot

    def body(cent, _):
        onehot = assign(cent, init_valid)
        counts = jnp.sum(onehot, axis=0)                           # [K]
        sums = jnp.dot(onehot.T, pts32, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
                        cent)                                      # empty: keep old
        return new, None

    centroids, _ = jax.lax.scan(body, centroids, None, length=iters)

    # final assignment for the cluster-mean bank
    onehot = assign(centroids, init_valid)
    counts = jnp.sum(onehot, axis=0)
    sums = jnp.dot(onehot.T, pts32, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    means = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None],
                      centroids)
    mean_valid = (counts > 0) & init_valid
    return centroids, init_valid, means, mean_valid


def cluster_objects(
    ref_emb_flat: jnp.ndarray,   # [R, C] reference-bank pixels
    ref_onehot_flat: jnp.ndarray,  # [R, O] labels (padding rows all-zero)
    key: jax.Array,
    k: int = 16,
    iters: int = 20,
    mixed: bool = False,
) -> ClusterBanks:
    """Per-object k-means over foreground reference pixels."""
    o = ref_onehot_flat.shape[-1]
    keys = jax.random.split(key, o)
    weights = ref_onehot_flat.T                                   # [O, R]
    cent, cv, means, mv = jax.vmap(
        lambda w_, k_: _masked_kmeans_single(ref_emb_flat, w_, k_, k, iters,
                                             mixed)
    )(weights, keys)
    return ClusterBanks(cent, cv, means, mv)


def cluster_matching(
    query_emb: jnp.ndarray,      # [H, W, C]
    banks: ClusterBanks,
    dis_bias: jnp.ndarray,       # [O]
    *,
    dtype=jnp.float32,
    cp_axis=None,
) -> jnp.ndarray:
    """Query↔proxy-bank min distances: returns [H, W, O, 2].

    Two channels per object (centroid bank, cluster-mean bank), the
    ``global_matching_cluster2`` output (``matching.py:1324-1404``).
    Objects with no valid centroids saturate at the padding distance →
    squashed ≈ 1, matching the reference's empty fallback
    (``matching.py:312-313``).
    """
    from .matching import (WRONG_LABEL_PADDING_DISTANCE, _cp_release,
                           _cp_rows, squash_distance)

    h, w, c = query_emb.shape
    q = _cp_rows(query_emb.reshape(h * w, c).astype(dtype), cp_axis)
    q2 = jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1)      # [M]

    def bank_min(bank, valid):
        o, k, _ = bank.shape
        b = bank.reshape(o * k, c).astype(dtype)
        b2 = jnp.sum(jnp.square(b.astype(jnp.float32)), axis=-1)
        cross = jnp.dot(q, b.T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        d = q2[:, None] + b2[None, :] - 2.0 * cross               # [M, O*K]
        d = d.reshape(-1, o, k)
        pen = (1.0 - valid.astype(jnp.float32)) * WRONG_LABEL_PADDING_DISTANCE
        return jnp.min(d + pen[None], axis=-1)                    # [M, O]

    d1 = bank_min(banks.centroids, banks.cent_valid)
    d2 = bank_min(banks.means, banks.mean_valid)
    d = _cp_release(jnp.stack([d1, d2], axis=-1), cp_axis)
    d = d.reshape(h, w, -1, 2)
    return squash_distance(d, dis_bias)
