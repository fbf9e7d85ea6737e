from .mesh import make_mesh, replicated, sharding
from .pipeline import make_pp_mesh, pipeline_forward_fn, shard_params_pp
from .sharding import (cache_specs, param_specs, shard_hybrid_model,
                       shard_model, shard_params)

__all__ = ["make_mesh", "replicated", "sharding", "cache_specs",
           "param_specs", "shard_hybrid_model", "shard_model", "shard_params",
           "make_pp_mesh", "pipeline_forward_fn", "shard_params_pp"]
