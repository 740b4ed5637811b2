from .sharding import (
    batch_sharding,
    infer_param_shardings,
    shard_variables,
)

__all__ = ["batch_sharding", "infer_param_shardings", "shard_variables"]
