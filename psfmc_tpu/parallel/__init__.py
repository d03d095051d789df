"""Multi-device parallelism: walker-ensemble sharding over a device mesh."""
from .mesh import (
    WALKER_AXIS,
    pad_walkers_to_mesh,
    shard_walkers,
    walker_mesh,
    walker_sharding,
)
from .multihost import (
    fetch,
    is_primary,
    process_count,
    process_index,
    put_replicated,
    put_sharded,
)

__all__ = [
    "WALKER_AXIS",
    "pad_walkers_to_mesh",
    "shard_walkers",
    "walker_mesh",
    "walker_sharding",
    "fetch",
    "is_primary",
    "process_count",
    "process_index",
    "put_replicated",
    "put_sharded",
]
