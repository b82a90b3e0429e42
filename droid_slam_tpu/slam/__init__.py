"""SLAM orchestration: motion filter, frontend, backend, trajectory filler,
Droid facade."""

from .droid import Droid  # noqa: F401

# Importing the slam layer pulls in jax (via .droid); re-run the package's
# guarded cache setup for entry points (demo.py, evaluation_scripts/*) that
# import droid_slam_tpu before jax — at package-import time the setup skips
# itself to avoid touching the axon plugin while the tunnel may be down.
from droid_slam_tpu import _enable_compilation_cache as _ecc

_ecc()
del _ecc
