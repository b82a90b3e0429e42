"""Data-parallel train step on the virtual CPU mesh (covers shard_map DP,
restart accumulation, optimizer update end-to-end)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_2dev():
    import __graft_entry__ as g
    g.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_as_driver():
    """Invoke dryrun_multichip exactly as the driver does: a fresh python
    process with NO device-count env prepared (the entry must bootstrap the
    virtual 8-device mesh itself, round-1 driver failure MULTICHIP_r01)."""
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "GRAFT_MULTICHIP_RESPAWNED")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


@pytest.mark.slow
def test_entry_compiles():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    Gs, disp_up, resid = out
    assert np.isfinite(np.asarray(Gs)).all()
