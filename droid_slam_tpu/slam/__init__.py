"""SLAM orchestration: motion filter, frontend, backend, trajectory filler,
Droid facade."""

from .droid import Droid  # noqa: F401


def make_droid(cfg, **kw):
    """Facade factory honoring cfg.asynchronous (demo.py:26-40 behavior):
    sync Droid, thread-async DroidAsync, or — with DROID_ASYNC_PROCESS=1 —
    the process-isolated DroidAsyncProcess (reference droid_async.py
    architecture: spawned backend process + shared-memory state)."""
    import os
    if not getattr(cfg, "asynchronous", False):
        return Droid(cfg, **kw)
    if os.environ.get("DROID_ASYNC_PROCESS", "0") == "1":
        from .async_process import DroidAsyncProcess
        return DroidAsyncProcess(cfg, **kw)
    from .async_droid import DroidAsync
    return DroidAsync(cfg, **kw)

# Importing the slam layer pulls in jax (via .droid); re-run the package's
# guarded cache setup for entry points (demo.py, evaluation_scripts/*) that
# import droid_slam_tpu before jax — at package-import time the setup skips
# itself to avoid touching the axon plugin while the tunnel may be down.
from droid_slam_tpu import _enable_compilation_cache as _ecc

_ecc()
del _ecc
