from .mesh import (
    batch_sharding,
    create_mesh,
    initialize_multihost,
    process_info,
    replicated_sharding,
    shard_batch,
    state_sharding,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "state_sharding",
    "initialize_multihost",
    "process_info",
]
