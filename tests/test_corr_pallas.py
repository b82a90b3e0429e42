"""Pallas corr-lookup kernel vs the XLA gather path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from droid_slam_tpu.ops import corr
from droid_slam_tpu.ops import corr_pallas


def test_pallas_lookup_matches_xla(rng):
    EB, EA = 6, 4
    h, w = 8, 16
    HW = h * w
    vol = rng.normal(size=(EB, HW, h, w)).astype(np.float32)
    slots = np.array([4, 0, 2, 5])
    coords = (rng.uniform(size=(EA, HW, 2)) *
              np.array([w + 4, h + 4]) - 2).astype(np.float32)

    out = np.asarray(corr_pallas.lookup_level_slots(
        jnp.asarray(vol), jnp.asarray(slots), jnp.asarray(coords),
        radius=3, interpret=True))

    expect = np.asarray(corr._lookup_level(
        jnp.asarray(vol[slots]), jnp.asarray(coords), 3))
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_pallas_lookup_bf16_volume(rng):
    EB, EA = 3, 2
    h, w = 8, 16
    HW = h * w
    vol = rng.normal(size=(EB, HW, h, w)).astype(np.float32)
    slots = np.array([1, 2])
    coords = (rng.uniform(size=(EA, HW, 2)) *
              np.array([w, h])).astype(np.float32)

    out = np.asarray(corr_pallas.lookup_level_slots(
        jnp.asarray(vol, jnp.bfloat16), jnp.asarray(slots),
        jnp.asarray(coords), radius=3, interpret=True))
    expect = np.asarray(corr._lookup_level(
        jnp.asarray(vol[slots], jnp.bfloat16).astype(jnp.float32),
        jnp.asarray(coords), 3))
    np.testing.assert_allclose(out, expect, atol=2e-2)
