"""Device-mesh helpers: the TPU replacement for the reference's NCCL DDP
(/root/reference/train.py:25-33). Data parallelism is expressed as a
jax.sharding.Mesh + shard_map with psum over ICI; the same code runs on one
chip, a pod slice, or the virtual CPU mesh used in tests."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "dp"):
    """Place a host batch with leading batch dim onto the mesh, sharded."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
