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
        # parity (f32) mode matches the XLA online-min's HIGHEST-precision
        # Gram trick; mixed mode keeps the single-pass bf16 MXU rate
        precision=(jax.lax.Precision.DEFAULT if mixed
                   else jax.lax.Precision.HIGHEST),
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


def _kernel_seg(q_ref, r_ref, bias_ref, out_ref, *, tiles_per_obj: int,
                mixed: bool, empty_dist: float):
    """Label-segmented variant: reference tiles are label-pure (bank
    rows sorted/padded per object, see
    ``matching.compact_reference_bank_segmented``), so the per-object
    penalty loop of ``_kernel`` — O× the VPU min work, its bottleneck —
    collapses to ONE biased min and a dynamic-row min-update into the
    tile's object channel."""
    j = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32)                      # [TM, C]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)            # [TM, 1]
    qd = q_ref[:].astype(jnp.bfloat16) if mixed else q_ref[:]

    # chunk the reference tile so the [TM, ck] distance intermediate
    # stays ~4 MB — the grid tile itself is large purely to amortize
    # the per-step pipeline overhead (~2 us) over more work
    tr = r_ref.shape[0]
    ck = min(tr, _CK_SEG)
    dmin = None
    for s in range(tr // ck):
        rc = r_ref[s * ck:(s + 1) * ck, :]
        r32 = rc.astype(jnp.float32)
        r2 = jnp.sum(r32 * r32, axis=1)                   # [ck]
        rd = rc.astype(jnp.bfloat16) if mixed else rc
        cross = jax.lax.dot_general(
            qd, rd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if mixed
                       else jax.lax.Precision.HIGHEST),
        )                                                 # [TM, ck]
        # filler/invalid rows carry +5e4 — folded into the r² row term
        d = q2 + (r2 + bias_ref[0, s * ck:(s + 1) * ck]).reshape(1, -1) \
            - 2.0 * cross
        if mixed:
            d = d.astype(jnp.bfloat16)
        m = jnp.min(d, axis=1).astype(jnp.float32)        # [TM]
        dmin = m if dmin is None else jnp.minimum(dmin, m)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, empty_dist)

    obj = j // tiles_per_obj
    cur = out_ref[pl.ds(obj, 1), :]
    out_ref[pl.ds(obj, 1), :] = jnp.minimum(cur, dmin.reshape(1, -1))


def _kernel_seg_map(tile_obj_ref, q_ref, r_ref, bias_ref, out_ref, *,
                    mixed: bool, empty_dist: float):
    """Occupancy-segmented variant: the tile→object map is DATA (scalar
    prefetch), so segment sizes can follow per-object occupancy
    (``matching.compact_reference_bank_occupancy``) instead of equal
    quotas — a dominant object keeps up to the whole bank.  Same single
    biased min per label-pure tile as ``_kernel_seg``; the min-update
    row comes from ``tile_obj_ref[j]``."""
    j = pl.program_id(1)

    q = q_ref[:].astype(jnp.float32)                      # [TM, C]
    q2 = jnp.sum(q * q, axis=1, keepdims=True)            # [TM, 1]
    qd = q_ref[:].astype(jnp.bfloat16) if mixed else q_ref[:]

    tr = r_ref.shape[0]
    ck = min(tr, _CK_SEG)
    dmin = None
    for s in range(tr // ck):
        rc = r_ref[s * ck:(s + 1) * ck, :]
        r32 = rc.astype(jnp.float32)
        r2 = jnp.sum(r32 * r32, axis=1)                   # [ck]
        rd = rc.astype(jnp.bfloat16) if mixed else rc
        cross = jax.lax.dot_general(
            qd, rd,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=(jax.lax.Precision.DEFAULT if mixed
                       else jax.lax.Precision.HIGHEST),
        )                                                 # [TM, ck]
        d = q2 + (r2 + bias_ref[0, s * ck:(s + 1) * ck]).reshape(1, -1) \
            - 2.0 * cross
        if mixed:
            d = d.astype(jnp.bfloat16)
        m = jnp.min(d, axis=1).astype(jnp.float32)        # [TM]
        dmin = m if dmin is None else jnp.minimum(dmin, m)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.full_like(out_ref, empty_dist)

    obj = tile_obj_ref[j]
    cur = out_ref[pl.ds(obj, 1), :]
    out_ref[pl.ds(obj, 1), :] = jnp.minimum(cur, dmin.reshape(1, -1))


_TM_SEG = 2048   # query tile — large tiles amortize the ~2 us/grid-step
_TR_SEG = 1024   # pipeline floor (the kernel is step-overhead-bound, not
#                  FLOP-bound: 512x512 tiles ran 1632 steps at 2.1 us each)
_CK_SEG = 512    # in-kernel reference chunk (bounds the f32 distance
#                  intermediate to TM*CK*4 = 4 MB of VMEM)
# channels with no bank segment (never stored) read as a huge finite
# distance — squashes to 1.0 exactly like the unsegmented all-penalty
# min (~5e4); finite so downstream arithmetic stays NaN-free
_EMPTY_DIST = 2.0 * WRONG_LABEL_PADDING_DISTANCE


@functools.partial(jax.jit, static_argnames=("n_obj", "interpret", "mixed"))
def global_matching_pallas_segmented(q: jnp.ndarray, r_emb: jnp.ndarray,
                                     bias: jnp.ndarray, n_obj: int,
                                     interpret: bool = False,
                                     mixed: bool = True) -> jnp.ndarray:
    """q: [M, C]; r_emb: [O*quota, C] label-segmented bank; bias: [O*quota]
    per-row penalty (0 = live row of its segment's object) → [M, O]."""
    m, c = q.shape
    p = r_emb.shape[0]
    quota = p // n_obj
    if quota * n_obj != p or quota % _TR_SEG:
        raise ValueError(f"bank rows {p} not segment-aligned for O={n_obj}")

    mp = _round_up(m, _TM_SEG)
    cp = _round_up(c, 128)
    op = _round_up(n_obj, 8)

    qp = jnp.pad(q, ((0, mp - m), (0, cp - c)))
    rep = jnp.pad(r_emb, ((0, 0), (0, cp - c)))
    biasp = bias.astype(jnp.float32).reshape(1, p)

    # double the reference tile when the per-object quota allows — the
    # kernel is pipeline-step-bound, so fewer/larger steps win as long
    # as segments stay tile-pure (in-kernel chunking bounds VMEM)
    tr = 2 * _TR_SEG if quota % (2 * _TR_SEG) == 0 else _TR_SEG
    grid = (mp // _TM_SEG, p // tr)
    out = pl.pallas_call(
        functools.partial(_kernel_seg, tiles_per_obj=quota // tr,
                          mixed=mixed, empty_dist=float(_EMPTY_DIST)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM_SEG, cp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tr, cp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tr), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((op, _TM_SEG), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((op, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * p * cp + 3 * mp * p,
            bytes_accessed=(mp * cp + p * cp + p + op * mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(qp, rep, biasp)
    return out[:n_obj, :m].T


@functools.partial(jax.jit, static_argnames=("n_obj", "interpret", "mixed"))
def global_matching_pallas_segmented_mapped(
        q: jnp.ndarray, r_emb: jnp.ndarray, bias: jnp.ndarray,
        tile_obj: jnp.ndarray, n_obj: int, interpret: bool = False,
        mixed: bool = True) -> jnp.ndarray:
    """Occupancy-segmented matching: ``tile_obj`` [n_tiles] int32 maps
    each reference tile (of ``P/n_tiles`` rows) to its object channel —
    data, not layout, so segment sizes follow occupancy.  q: [M, C];
    r_emb: [P, C]; bias: [P] per-row penalty → [M, n_obj]."""
    m, c = q.shape
    p = r_emb.shape[0]
    n_tiles = tile_obj.shape[0]
    tr = p // n_tiles
    # tr must also be a multiple of the in-kernel chunk (ADVICE r3: the
    # chunk loop would silently drop tail rows for e.g. tr=768)
    if tr * n_tiles != p or tr % 256 or tr % min(tr, _CK_SEG):
        raise ValueError(f"bank rows {p} not tile-aligned for {n_tiles} tiles")

    mp = _round_up(m, _TM_SEG)
    cp = _round_up(c, 128)
    op = _round_up(n_obj, 8)

    qp = jnp.pad(q, ((0, mp - m), (0, cp - c)))
    rep = jnp.pad(r_emb, ((0, 0), (0, cp - c)))
    biasp = bias.astype(jnp.float32).reshape(1, p)

    grid = (mp // _TM_SEG, n_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM_SEG, cp), lambda i, j, *_: (i, 0)),
            pl.BlockSpec((tr, cp), lambda i, j, *_: (j, 0)),
            pl.BlockSpec((1, tr), lambda i, j, *_: (0, j)),
        ],
        out_specs=pl.BlockSpec((op, _TM_SEG), lambda i, j, *_: (0, i)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_seg_map, mixed=mixed,
                          empty_dist=float(_EMPTY_DIST)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((op, mp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * p * cp + 3 * mp * p,
            bytes_accessed=(mp * cp + p * cp + p + op * mp) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(tile_obj.astype(jnp.int32), qp, rep, biasp)
    return out[:n_obj, :m].T


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
