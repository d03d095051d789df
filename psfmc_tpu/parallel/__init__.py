"""Multi-device parallelism: walker-ensemble sharding over a device mesh."""
from .mesh import (
    WALKER_AXIS,
    pad_walkers_to_mesh,
    shard_walkers,
    walker_mesh,
    walker_sharding,
)

__all__ = [
    "WALKER_AXIS",
    "pad_walkers_to_mesh",
    "shard_walkers",
    "walker_mesh",
    "walker_sharding",
]
