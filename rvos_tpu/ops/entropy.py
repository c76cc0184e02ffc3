"""Shannon-entropy uncertainty for the RPA confident-mask filter.

Reference: ``cal_shannon_entropy`` (``networks/layers/shannon_entropy.py:10``)
computed over the *existing-label* probability channels
(``eval_manager_mm.py:306``).  Static-shape version: zero out
non-existing channels with a class mask — a zero probability contributes
0 to −Σ p·log(p+1e-6), so the sum over all channels equals the
reference's sum over the dynamic subset.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def shannon_entropy(probs: jnp.ndarray, class_mask: jnp.ndarray) -> jnp.ndarray:
    """probs: [O, H, W] (or [..., O, H, W]); class_mask: [O] → [H, W]."""
    p = probs * class_mask[..., :, None, None]
    unc = -jnp.sum(p * jnp.log(p + 1e-6), axis=-3)
    return unc


def normalized_entropy(unc: jnp.ndarray) -> jnp.ndarray:
    """Reference's reversed normalization (``shannon_entropy.py:5-13``)."""
    return (1.0 - unc / np.log(2.0)) * 7.0
