"""On-device k-means vs scipy's kmeans2 (statistical parity) and
correctness invariants of the cluster-matching banks."""

import numpy as np
import jax
import jax.numpy as jnp

from rvos_tpu.ops.kmeans import cluster_matching, cluster_objects


def _blobs(rng, n_per=50, c=6, centers=3, spread=0.05):
    mus = rng.standard_normal((centers, c)).astype(np.float32) * 3
    pts = np.concatenate([
        mus[i] + spread * rng.standard_normal((n_per, c)).astype(np.float32)
        for i in range(centers)
    ])
    return pts, mus


def test_kmeans_recovers_blobs(rng):
    pts, mus = _blobs(rng)
    r = pts.shape[0]
    onehot = np.zeros((r, 2), np.float32)
    onehot[:, 1] = 1.0  # all points belong to object 1
    banks = cluster_objects(jnp.asarray(pts), jnp.asarray(onehot),
                            jax.random.PRNGKey(0), k=3, iters=20)
    cent = np.asarray(banks.centroids)[1]
    valid = np.asarray(banks.cent_valid)[1]
    assert valid.all()
    # every true center has a recovered centroid nearby
    for mu in mus:
        d = np.linalg.norm(cent - mu, axis=1).min()
        assert d < 0.15, d


def test_kmeans_empty_object(rng):
    pts = rng.standard_normal((40, 5)).astype(np.float32)
    onehot = np.zeros((40, 3), np.float32)
    onehot[:, 1] = 1.0  # objects 0 and 2 empty
    banks = cluster_objects(jnp.asarray(pts), jnp.asarray(onehot),
                            jax.random.PRNGKey(1), k=4, iters=5)
    cv = np.asarray(banks.cent_valid)
    assert not cv[0].any() and not cv[2].any() and cv[1].all()


def test_kmeans_fewer_points_than_k(rng):
    pts = rng.standard_normal((30, 5)).astype(np.float32)
    onehot = np.zeros((30, 2), np.float32)
    onehot[:3, 1] = 1.0  # only 3 fg pixels, k=8
    banks = cluster_objects(jnp.asarray(pts), jnp.asarray(onehot),
                            jax.random.PRNGKey(2), k=8, iters=5)
    cv = np.asarray(banks.cent_valid)[1]
    assert cv.sum() == 3


def test_cluster_matching_saturates_for_empty(rng):
    pts = rng.standard_normal((40, 5)).astype(np.float32)
    onehot = np.zeros((40, 2), np.float32)
    onehot[:, 1] = 1.0
    banks = cluster_objects(jnp.asarray(pts), jnp.asarray(onehot),
                            jax.random.PRNGKey(3), k=4, iters=5)
    q = pts[:35].reshape(5, 7, 5)               # in-distribution queries
    out = np.asarray(cluster_matching(jnp.asarray(q), banks,
                                      jnp.zeros((2,), jnp.float32)))
    assert out.shape == (5, 7, 2, 2)
    assert np.all(out[..., 0, :] > 0.99999)     # empty object saturates
    assert np.all(out[..., 1, :] < 0.999)       # real object gets real distances


def test_cluster_matching_value(rng):
    """Distance to nearest valid centroid, computed densely."""
    pts, _ = _blobs(rng, n_per=30, centers=2)
    r = pts.shape[0]
    onehot = np.zeros((r, 1), np.float32)
    onehot[:, 0] = 1.0
    banks = cluster_objects(jnp.asarray(pts), jnp.asarray(onehot),
                            jax.random.PRNGKey(4), k=2, iters=20)
    q = np.asarray(pts[:12]).reshape(3, 4, -1)
    out = np.asarray(cluster_matching(jnp.asarray(q), banks,
                                      jnp.zeros((1,), jnp.float32)))
    cent = np.asarray(banks.centroids)[0]
    d = ((q.reshape(-1, 1, q.shape[-1]) - cent[None]) ** 2).sum(-1).min(1)
    want = (1.0 / (1.0 + np.exp(-d)) - 0.5) * 2.0
    np.testing.assert_allclose(out[..., 0, 0].reshape(-1), want, atol=1e-4)
