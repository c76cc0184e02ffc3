"""Fused Pallas TPU kernel for multi-radius local matching.

The XLA formulation (``_local_matching_online``) scans 25 window rows,
re-materializing [K, h, w, C] shifted bands each step; at eval shapes
that costs ~4ms per call in scan/bookkeeping overhead.  Here the whole
problem lives in VMEM at once — the downsampled grid is small
(61×107×128 bf16 ≈ 1.7 MB; padded neighbor frame ≈ 2.9 MB) — and a
single program loops the (2D+1)² window offsets, updating per-radius
per-object running minimums in place:

    out[r, o] = min over offsets within radius r of
                (||x - shift(y)||² + 5e4·(1 - label_o(shift)))

* distances: f32 norms (precomputed outside) + in-kernel cross terms;
* the static offset→radius membership table rides in SMEM and gates
  predicated updates (``@pl.when``) — no masked cube is ever built;
* wrong-label / out-of-frame penalties are pre-baked into a padded
  [O, h+2D, w+2D] penalty plane (labels zero-padded ⇒ penalty 5e4
  outside the frame, matching ``matching.py:2710-2752`` semantics).

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


def _kernel(rmask_ref, x_ref, x2_ref, y_ref, y2_ref, pen_ref, out_ref,
            *, k: int, h: int, w: int, n_obj: int, n_r: int, atrous: int):
    out_ref[:] = jnp.full_like(out_ref, WRONG_LABEL_PADDING_DISTANCE * 2.0)

    x = x_ref[:]
    x2 = x2_ref[:]

    def body(i, _):
        dy = (i // k) * atrous
        dx = (i % k) * atrous
        ys = y_ref[pl.ds(dy, h), pl.ds(dx, w), :]
        y2s = y2_ref[pl.ds(dy, h), pl.ds(dx, w)]
        cross = jnp.sum(x * ys, axis=-1, dtype=jnp.float32)
        d = x2 + y2s - 2.0 * cross                       # [h, w] f32
        for o in range(n_obj):
            pen_s = pen_ref[o, pl.ds(dy, h), pl.ds(dx, w)]
            d_o = d + pen_s
            for r in range(n_r):
                @pl.when(rmask_ref[i, r] > 0)
                def _():
                    out_ref[r, o] = jnp.minimum(out_ref[r, o], d_o)
        return 0

    jax.lax.fori_loop(0, k * k, body, 0)


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
    max_d = int(radii[-1])
    pad_d = max_d - max_d % atrous_rate
    a_max = pad_d // atrous_rate
    k = 2 * a_max + 1
    order = [int(radii[-1]) // atrous_rate] + \
        [int(r) // atrous_rate for r in radii[:-1]]
    n_r = len(order)

    cp = ((c + 127) // 128) * 128
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, cp - c)))
    yp = jnp.pad(y, ((pad_d, pad_d), (pad_d, pad_d), (0, cp - c)))
    x2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1)
    y2 = jnp.pad(jnp.sum(jnp.square(y.astype(jnp.float32)), axis=-1),
                 ((pad_d, pad_d), (pad_d, pad_d)),
                 constant_values=WRONG_LABEL_PADDING_DISTANCE)
    pen = jnp.pad(
        (1.0 - jnp.transpose(onehot, (2, 0, 1)).astype(jnp.float32))
        * WRONG_LABEL_PADDING_DISTANCE,
        ((0, 0), (pad_d, pad_d), (pad_d, pad_d)),
        constant_values=WRONG_LABEL_PADDING_DISTANCE)

    # static offset→radius membership table
    rmask = np.zeros((k * k, n_r), np.int32)
    for i in range(k * k):
        dy = abs(i // k - a_max)
        dx = abs(i % k - a_max)
        for ri, r in enumerate(order):
            rmask[i, ri] = int(dy <= r and dx <= r)
    rmask_j = jnp.asarray(rmask)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, h=h, w=w, n_obj=o, n_r=n_r,
                          atrous=atrous_rate),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, o, h, w), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * h * w * cp,
            bytes_accessed=(h * w * cp + (h + 2 * pad_d) * (w + 2 * pad_d)
                            * (cp + o)) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(rmask_j, xp, x2, yp, y2, pen)
    return jnp.transpose(out, (2, 3, 1, 0))              # [h, w, O, n_r]
