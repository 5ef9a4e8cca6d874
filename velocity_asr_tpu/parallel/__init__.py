"""Device-mesh and sharding utilities."""

from .mesh import create_mesh, data_sharding, replicated_sharding

__all__ = ["create_mesh", "data_sharding", "replicated_sharding"]
