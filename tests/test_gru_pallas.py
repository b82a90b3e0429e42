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
    monkeypatch.setenv("DROID_GRU_PALLAS", "interpret")
    params, net, cfin, pre = _mk(dtype)

    ref = nets.conv_gru(params, net, cfin, pre=pre, pallas_ok=False)
    out = nets.conv_gru(params, net, cfin, pre=pre, pallas_ok=True)

    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)


def test_pallas_gate_off_without_env(monkeypatch):
    """On CPU without the env override the gate must resolve to off."""
    monkeypatch.delenv("DROID_GRU_PALLAS", raising=False)
    if jax.default_backend() == "cpu":
        assert nets._gru_pallas_mode() == ""
    monkeypatch.setenv("DROID_GRU_PALLAS", "0")
    assert nets._gru_pallas_mode() == ""
    monkeypatch.setenv("DROID_GRU_PALLAS", "1")
    assert nets._gru_pallas_mode() == "on"
