"""Context-parallel global matching over the virtual 8-device mesh
(SURVEY.md §2.10 — query-pixel sharding, the CP analogue)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh


def test_context_parallel_matches_single_device(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from rvos_tpu.parallel.context import global_matching_context_parallel
    from rvos_tpu.ops.matching import global_matching_flat

    mesh = Mesh(np.array(jax.devices()[:8]), ("model",))
    h, w, c, o, r = 9, 11, 8, 3, 50
    q = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    re = jnp.asarray(rng.standard_normal((r, c)).astype(np.float32))
    lab = jnp.asarray(np.eye(o, dtype=np.float32)[rng.integers(0, o, size=(r,))])
    bias = jnp.asarray(rng.standard_normal((o,)).astype(np.float32) * 0.1)

    got = np.asarray(global_matching_context_parallel(q, re, lab, bias, mesh))
    want = np.asarray(global_matching_flat(q, re, lab, bias))
    np.testing.assert_allclose(got, want, atol=1e-4)
