"""Device-mesh helpers (data parallelism over ICI)."""

from .mesh import data_parallel_mesh, replicate, shard_batch

__all__ = ["data_parallel_mesh", "replicate", "shard_batch"]
