"""Fused Pallas TPU kernel for multi-radius local matching.

The XLA formulation (``_local_matching_online``) scans 25 window rows,
re-materializing [K, h, w, C] shifted bands each step; at eval shapes
that costs ~4ms per call in scan/bookkeeping overhead.  Kernel design:

* the neighbor frame is pre-shifted into K column slabs
  ``y_cols[K, h+2D, w, 128]`` in HBM; the grid iterates the K shifts and
  Pallas pipelines each slab HBM→VMEM;
* spare embedding lanes carry side-band data: lane C = ‖y‖² (padded
  with the 5e4 out-of-frame distance), lanes C+1+o = the per-object
  wrong-label penalties — so the kernel reads ONE tensor and every lane
  index is static (Mosaic forbids dynamic sublane slicing; row shifts
  use the untiled leading dim);
* inside each program a fori over the K row shifts computes the
  distance plane and applies predicated per-(radius, object) running-
  min updates — the output block is revisited by every program and
  min-accumulated in VMEM; the [h, w, K², O] masked cube of the
  reference's unfold (``matching.py:2710-2837``) never exists.

Reference: ``local_matching`` / ``local_matching_proxy``
(``matching.py:2757-2945``).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matching import WRONG_LABEL_PADDING_DISTANCE


def _kernel(rmask_ref, x_ref, x2_ref, ycol_ref, out_ref,
            *, k: int, h: int, w: int, c: int, n_obj: int, n_r: int,
            atrous: int):
    dx = pl.program_id(0)

    @pl.when(dx == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref,
                                   2.0 * WRONG_LABEL_PADDING_DISTANCE)

    x = x_ref[:]                                        # [h, w, 128]
    x2 = x2_ref[:]                                      # [h, w]

    def body(dy, _):
        ys = ycol_ref[0, pl.ds(dy * atrous, h), :, :]   # [h, w, 128]
        cross = jnp.sum(x * ys, axis=-1, dtype=jnp.float32)
        y2s = ys[:, :, c].astype(jnp.float32)           # side-band lane
        d = x2 + y2s - 2.0 * cross                      # [h, w] f32
        i = dy * k + dx
        for o in range(n_obj):
            pen_s = ys[:, :, c + 1 + o].astype(jnp.float32)
            d_o = d + pen_s
            for r in range(n_r):
                @pl.when(rmask_ref[i, r] > 0)
                def _():
                    out_ref[r, o] = jnp.minimum(out_ref[r, o], d_o)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("radii", "atrous_rate", "interpret"))
def local_matching_pallas(
    x: jnp.ndarray,           # [h, w, C] query (downsampled grid)
    y: jnp.ndarray,           # [h, w, C] previous frame
    onehot: jnp.ndarray,      # [h, w, O]
    radii: Sequence[int] = (2, 4, 6, 8, 10, 12),
    atrous_rate: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw multi-radius masked mins [h, w, O, n_r] (unsquashed), channel
    order [full radius, radii[:-1]] like the reference."""
    h, w, c = x.shape
    o = onehot.shape[-1]
    assert c + 1 + o <= ((c + 1 + o + 127) // 128) * 128
    max_d = int(radii[-1])
    pad_d = max_d - max_d % atrous_rate
    a_max = pad_d // atrous_rate
    k = 2 * a_max + 1
    order = [int(radii[-1]) // atrous_rate] + \
        [int(r) // atrous_rate for r in radii[:-1]]
    n_r = len(order)

    cp = ((c + 1 + o + 127) // 128) * 128
    dtype = x.dtype
    BIG = WRONG_LABEL_PADDING_DISTANCE

    xp = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c)))
    x2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)

    # assemble y + side-band lanes, pad spatially, pre-shift columns
    y2 = jnp.sum(jnp.square(y.astype(jnp.float32)), axis=-1)
    pen = (1.0 - onehot.astype(jnp.float32)) * BIG       # [h, w, O]
    side = jnp.concatenate([y2[..., None], pen], axis=-1)
    yfull = jnp.concatenate([
        y.astype(jnp.float32), side,
        jnp.zeros((h, w, cp - c - 1 - o), jnp.float32)], axis=-1)
    pad_val = jnp.zeros((cp,), jnp.float32)
    pad_val = pad_val.at[c].set(BIG)                     # out-of-frame ‖y‖²
    pad_val = pad_val.at[c + 1: c + 1 + o].set(BIG)      # and penalties
    yp = jnp.pad(yfull, ((pad_d, pad_d), (pad_d, pad_d), (0, 0)))
    yp = yp + pad_val * (
        jnp.pad(jnp.ones((h, w, 1), jnp.float32),
                ((pad_d, pad_d), (pad_d, pad_d), (0, 0))) == 0.0)
    yp = yp.astype(dtype)

    y_cols = jnp.stack(
        [jax.lax.slice_in_dim(yp, i * atrous_rate, i * atrous_rate + w,
                              axis=1) for i in range(k)], axis=0
    )                                                    # [K, h+2D, w, cp]

    rmask = np.zeros((k * k, n_r), np.int32)
    for i in range(k * k):
        dy = abs(i // k - a_max)
        dx = abs(i % k - a_max)
        for ri, r in enumerate(order):
            rmask[i, ri] = int(dy <= r and dx <= r)
    rmask_j = jnp.asarray(rmask)

    hp = h + 2 * pad_d
    out = pl.pallas_call(
        functools.partial(_kernel, k=k, h=h, w=w, c=c, n_obj=o, n_r=n_r,
                          atrous=atrous_rate),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w, cp), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hp, w, cp), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_r, o, h, w), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, o, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * h * w * cp,
            bytes_accessed=k * hp * w * cp * 2 + h * w * cp * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rmask_j, xp.astype(dtype), x2, y_cols)
    return jnp.transpose(out, (2, 3, 1, 0))              # [h, w, O, n_r]
