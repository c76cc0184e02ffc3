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
