"""Device mesh, sharding rules, and the sharded train step."""

from .mesh import create_mesh
from .sharding import (
    batch_sharding,
    host_batch_to_global,
    replicated,
    zero_shardings,
)
from .tp import tp_shardings

__all__ = [
    "batch_sharding",
    "create_mesh",
    "replicated",
    "tp_shardings",
    "zero_shardings",
]
