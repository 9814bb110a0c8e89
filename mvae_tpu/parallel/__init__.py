"""Parallelism (new vs reference): mesh, shardings, distributed train step."""
from .mesh import (batch_sharding, make_mesh, param_shardings, replicated,
                   shard_batch, shard_params)

__all__ = ["make_mesh", "batch_sharding", "replicated", "param_shardings",
           "shard_params", "shard_batch"]
