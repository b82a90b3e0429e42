"""Parity of the Pallas GRU gate epilogues (ops/gru_pallas.py) vs the XLA
conv_gru pre-path they replace (models/nets.py), in Pallas interpret mode.

The kernels accumulate in f32 where the XLA path's elementwise adds run in
the working dtype, so bf16 inputs are compared at bf16 rounding tolerance
and f32 inputs tightly."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from droid_slam_tpu.models import nets


def _mk(dtype, seed=0, E=3, h=8, w=16):
    key = jax.random.PRNGKey(seed)
    params = nets.init_params(key)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed + 1), 3)
    net = (0.1 * jax.random.normal(k1, (E, h, w, 128))).astype(dtype)
    inp_ctx = jax.random.normal(k2, (E, h, w, 128)).astype(dtype)
    cfin = jax.random.normal(k3, (E, h, w, 192)).astype(dtype)
    params = {k: v.astype(dtype) if k.endswith(("weight", "bias")) else v
              for k, v in params.items()}
    pre = nets.gru_context_pre(params, inp_ctx)
    return params, net, cfin, pre


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 1e-5),
                                       (jnp.bfloat16, 3e-2)])
def test_pallas_epilogues_match_xla_pre_path(monkeypatch, dtype, tol):
    # env is frozen at import (ADVICE r3) — patch the module constant
    monkeypatch.setattr(nets, "_GRU_PALLAS_ENV", "interpret")
    params, net, cfin, pre = _mk(dtype)

    ref = nets.conv_gru(params, net, cfin, pre=pre, pallas_ok=False)
    out = nets.conv_gru(params, net, cfin, pre=pre, pallas_ok=True)

    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_pallas_gate_off_by_default(monkeypatch):
    """Default (no env) is OFF on every backend — the fused epilogues
    measured slower than XLA's fusions on real v5e (BENCH_NOTES r4)."""
    monkeypatch.setattr(nets, "_GRU_PALLAS_ENV", "")
    assert nets._gru_pallas_mode() == ""
    monkeypatch.setattr(nets, "_GRU_PALLAS_ENV", "0")
    assert nets._gru_pallas_mode() == ""
    # '1' compiles Mosaic only on TPU; non-TPU backends degrade to
    # interpret instead of crashing (ADVICE r3)
    monkeypatch.setattr(nets, "_GRU_PALLAS_ENV", "1")
    expect = "on" if jax.default_backend() == "tpu" else "interpret"
    assert nets._gru_pallas_mode() == expect


def test_pallas_vmem_guard(monkeypatch):
    """Large feature planes must fall back to the XLA path instead of
    exceeding Mosaic's ~16 MiB scoped-VMEM limit (ADVICE r3)."""
    monkeypatch.setattr(nets, "_GRU_PALLAS_ENV", "interpret")
    calls = []
    import droid_slam_tpu.ops.gru_pallas as gp
    orig = gp.gru_epilogue_a

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(gp, "gru_epilogue_a", spy)
    # small plane -> pallas path taken
    params, net, cfin, pre = _mk(jnp.float32, h=8, w=16)
    nets.conv_gru(params, net, cfin, pre=pre, pallas_ok=True)
    assert calls, "small plane should use the pallas epilogues"
    # huge plane -> guard trips, XLA path (no further spy calls)
    n = len(calls)
    params, net, cfin, pre = _mk(jnp.float32, E=1, h=128, w=160)
    nets.conv_gru(params, net, cfin, pre=pre, pallas_ok=True)
    assert len(calls) == n, "large plane must fall back to the XLA path"
