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
def test_entry_compiles():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    Gs, disp_up, resid = out
    assert np.isfinite(np.asarray(Gs)).all()
