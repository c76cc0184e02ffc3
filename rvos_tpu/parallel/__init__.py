from .context import global_matching_context_parallel
from .mesh import (ambient_mesh_ctx, cp_mesh, data_sharding, make_mesh,
                   replicated, shard_batch)

__all__ = ["ambient_mesh_ctx", "cp_mesh", "data_sharding",
           "global_matching_context_parallel", "make_mesh", "replicated",
           "shard_batch"]
