from .mesh import (
    create_mesh,
    fsdp_shardings,
    replicate,
    shard_batch,
    shard_params,
)

__all__ = ["create_mesh", "fsdp_shardings", "replicate", "shard_batch", "shard_params"]
