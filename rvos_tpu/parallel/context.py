"""Context-parallel global matching.

SURVEY.md §2.10: the reference's only "sequence" scaling is query
chunking on one GPU (``matching.py:200-249``).  The TPU-native
multi-chip analogue shards the query-pixel axis of global matching over
a mesh axis — each device owns a tile of query rows against the full
(replicated) reference bank; results concatenate back along the pixel
axis with zero cross-device math (an embarrassingly parallel
context-parallel layout).  When a bank outgrows replication, the next
step is ring-passing bank tiles over ICI with a running min (the
flash-attention ring pattern) — the online-min formulation in
``_global_matching_xla`` is already associative, so only the RDMA loop
is missing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map            # jax >= 0.8
except ImportError:                      # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops.matching import _global_matching_xla, squash_distance


def global_matching_context_parallel(
    query_emb: jnp.ndarray,    # [H, W, C]
    r_emb: jnp.ndarray,        # [R, C] flat reference bank
    r_lab: jnp.ndarray,        # [R, O]
    dis_bias: jnp.ndarray,     # [O]
    mesh: Mesh,
    axis: str = "model",
    tile_r: int = 4096,
) -> jnp.ndarray:
    """[H, W, O, 1] squashed NN distance maps, query rows sharded."""
    h, w, c = query_emb.shape
    o = r_lab.shape[-1]
    n = mesh.shape[axis]
    m = h * w
    pad_m = (-m) % n
    q = query_emb.reshape(m, c)
    if pad_m:
        q = jnp.pad(q, ((0, pad_m), (0, 0)))

    @jax.jit
    def run(q, r_emb, r_lab):
        def body(q_shard, re, rl):
            return _global_matching_xla(q_shard, re, rl, tile_r)

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None), P(None, None), P(None, None)),
            out_specs=P(axis, None),
        )
        return fn(q, r_emb, r_lab)

    d_min = run(q, r_emb, r_lab)[:m].reshape(h, w, o)
    return squash_distance(d_min[..., None], dis_bias)


def global_matching_bank_sharded(
    query_emb: jnp.ndarray,    # [H, W, C]
    r_emb: jnp.ndarray,        # [R, C] flat reference bank
    r_lab: jnp.ndarray,        # [R, O]
    dis_bias: jnp.ndarray,     # [O]
    mesh: Mesh,
    axis: str = "model",
    tile_r: int = 4096,
) -> jnp.ndarray:
    """Bank-sharded global matching: each device holds a tile of the
    reference bank (queries replicated), computes its local per-object
    online min, and the global min is ONE ``pmin`` collective over ICI.

    This is the "bank outgrows replication" mode the round-1 design
    notes deferred: per-device bank memory is R/n, so the effective
    bank capacity scales linearly with the mesh axis.  The running-min
    reduction is associative, so shard-local mins + a min-allreduce is
    numerically identical to the single-device scan — no ring
    hand-scheduling needed (XLA lowers the allreduce to the optimal ICI
    pattern).  Padding rows carry all-zero labels → the wrong-label
    penalty keeps them out of every min.  Returns [H, W, O, 1].
    """
    h, w, c = query_emb.shape
    o = r_lab.shape[-1]
    n = mesh.shape[axis]
    r = r_emb.shape[0]
    pad_r = (-r) % n
    if pad_r:
        r_emb = jnp.pad(r_emb, ((0, pad_r), (0, 0)))
        r_lab = jnp.pad(r_lab, ((0, pad_r), (0, 0)))
    q = query_emb.reshape(h * w, c)

    @jax.jit
    def run(q, r_emb, r_lab):
        def body(q_full, re_shard, rl_shard):
            # q arrives replicated (unvarying over `axis`) while the
            # bank tiles vary — mark q varying so the online-min scan's
            # carry types agree inside the manual region
            if hasattr(jax.lax, "pcast"):
                q_full = jax.lax.pcast(q_full, axis, to="varying")
            else:  # older jax
                q_full = jax.lax.pvary(q_full, axis)
            local = _global_matching_xla(q_full, re_shard, rl_shard,
                                         min(tile_r, re_shard.shape[0]))
            return jax.lax.pmin(local, axis)

        fn = shard_map(
            body, mesh=mesh,
            in_specs=(P(None, None), P(axis, None), P(axis, None)),
            out_specs=P(None, None),
        )
        return fn(q, r_emb, r_lab)

    d_min = run(q, r_emb, r_lab).reshape(h, w, o)
    return squash_distance(d_min[..., None], dis_bias)
