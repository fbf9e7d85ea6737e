from .mesh import make_mesh, replicated, sharding
from .sharding import cache_specs, param_specs, shard_model, shard_params

__all__ = ["make_mesh", "replicated", "sharding", "cache_specs",
           "param_specs", "shard_model", "shard_params"]
