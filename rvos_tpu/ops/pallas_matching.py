"""Fused Pallas TPU kernel for global nearest-neighbor matching.

Computes, for every query pixel m and object o,

    min_r  ||q_m - r_r||² + 5e4 · (1 - label[r, o])

without materializing the [M, R] distance matrix.  This is the
framework's hottest op (reference ``matching.py:2305/2384``; the
reference bounds GPU memory with Python-level query chunking at
``matching.py:200-249`` — here the tiling lives inside the kernel,
flash-attention-style).

Layout choices (TPU tiling rules):
* embedding dim C padded to a 128-lane multiple (zero padding does not
  change distances);
* the per-object wrong-label penalty is passed pre-transposed as
  [O_pad, R] so the kernel broadcasts it along lanes of the [TM, TR]
  distance tile (a sublane→lane transpose inside the kernel would
  serialize on the VPU);
* output is [O_pad, M] (objects on sublanes, pixels on lanes) and is
  min-accumulated in VMEM across the reference-tile grid dimension.

Grid: (m_tiles, r_tiles), r fastest — the output block for a given m
tile stays resident in VMEM while the kernel scans reference tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matching import WRONG_LABEL_PADDING_DISTANCE

_TM = 512   # query-pixel tile
_TR = 1024  # reference-pixel tile


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(q_ref, r_ref, pen_ref, out_ref, *, n_obj: int, mixed: bool):
    j = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32)                      # [TM, C]
    r = r_ref[:].astype(jnp.float32)                      # [TR, C]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)            # [TM, 1]
    r2 = jnp.sum(r * r, axis=1, keepdims=True)            # [TR, 1]
    if mixed:
        # bf16 cross term at MXU full rate, f32 norms + accumulation —
        # the TPU analogue of MODEL_FLOAT16_MATCHING (matching.py:2331)
        # with ~8× the fp32 throughput and ≲0.5% distance error.
        qd = q_ref[:].astype(jnp.bfloat16)
        rd = r_ref[:].astype(jnp.bfloat16)
    else:
        qd, rd = q_ref[:], r_ref[:]
    cross = jax.lax.dot_general(
        qd, rd,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                     # [TM, TR]
    d = q2 + r2.reshape(1, -1) - 2.0 * cross

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, np.inf)

    if mixed:
        # bf16 min datapath: 2x VPU lanes; distances are O(10) so the
        # bf16 mantissa costs <0.5% — well inside matching tolerance.
        d = d.astype(jnp.bfloat16)
    for o in range(n_obj):                                # static unroll
        pen_row = pen_ref[o, :].reshape(1, -1).astype(d.dtype)  # [1, TR]
        dm = jnp.min(d + pen_row, axis=1).astype(jnp.float32)   # [TM]
        out_ref[o, :] = jnp.minimum(out_ref[o, :], dm)


@functools.partial(jax.jit, static_argnames=("interpret", "mixed"))
def global_matching_pallas(q: jnp.ndarray, r_emb: jnp.ndarray,
                           r_lab: jnp.ndarray, interpret: bool = False,
                           mixed: bool = True) -> jnp.ndarray:
    """q: [M, C]; r_emb: [R, C]; r_lab: [R, O] → [M, O] min distances."""
    m, c = q.shape
    r, o = r_lab.shape

    mp = _round_up(m, _TM)
    rp = _round_up(r, _TR)
    cp = _round_up(c, 128)
    op = _round_up(o, 8)

    qp = jnp.pad(q, ((0, mp - m), (0, cp - c)))
    rep = jnp.pad(r_emb, ((0, rp - r), (0, cp - c)))
    # penalty, pre-transposed: padded reference rows penalize every object
    pen = (1.0 - r_lab.T.astype(jnp.float32)) * WRONG_LABEL_PADDING_DISTANCE
    pen = jnp.pad(pen, ((0, op - o), (0, rp - r)),
                  constant_values=WRONG_LABEL_PADDING_DISTANCE)

    grid = (mp // _TM, rp // _TR)
    out = pl.pallas_call(
        functools.partial(_kernel, n_obj=o, mixed=mixed),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, cp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TR, cp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((op, _TR), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((op, _TM), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((op, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * rp * cp + 3 * mp * rp * op,
            bytes_accessed=(mp * cp + rp * cp + op * rp + op * mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rep, pen)
    return out[:o, :m].T
