"""MobileNetV2 alternative backbone (reference mobilenet.py:69)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_mobilenet_deeplab_shapes(rng):
    from rvos_tpu.models.deeplab import DeepLab

    m = DeepLab(16, "mobilenet")
    x = jnp.asarray(rng.standard_normal((1, 65, 65, 3)).astype(np.float32))
    var = m.init(jax.random.PRNGKey(0), x)
    out, low = m.apply(var, x)
    assert out.shape[-1] == 256
    assert low.shape[-1] == 24          # mobilenet low-level channels
    assert out.shape[1:3] == low.shape[1:3]
