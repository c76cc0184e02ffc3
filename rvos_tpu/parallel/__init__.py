from .context import global_matching_context_parallel
from .mesh import data_sharding, make_mesh, replicated, shard_batch

__all__ = ["data_sharding", "global_matching_context_parallel", "make_mesh",
           "replicated", "shard_batch"]
