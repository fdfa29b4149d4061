"""Device mesh, sharding rules, and the sharded train step."""

from .mesh import create_mesh
from .sharding import batch_sharding, replicated, zero_shardings

__all__ = ["create_mesh", "batch_sharding", "replicated", "zero_shardings"]
