"""Test config: force CPU with a virtual 8-device mesh BEFORE jax import.

Multi-chip sharding is validated on the virtual mesh
(xla_force_host_platform_device_count); real-TPU numbers come from bench.py.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU backend explicitly
# so tests never ride the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
