"""One-hot matmul lookup formulation vs the gather reference."""

import numpy as np
import jax.numpy as jnp

from droid_slam_tpu.ops import corr


def test_onehot_matches_gather(rng):
    E, h, w = 3, 8, 16
    HW = h * w
    vol = rng.normal(size=(E, HW, h, w)).astype(np.float32)
    coords = (rng.uniform(size=(E, HW, 2)) *
              np.array([w + 4, h + 4]) - 2).astype(np.float32)

    out = np.asarray(corr._lookup_level_onehot(jnp.asarray(vol),
                                               jnp.asarray(coords), 3))
    expect = np.asarray(corr._lookup_level(jnp.asarray(vol),
                                           jnp.asarray(coords), 3))
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_tent_matches_gather(rng):
    E, h, w = 3, 8, 16
    HW = h * w
    vol = rng.normal(size=(E, HW, h, w)).astype(np.float32)
    coords = (rng.uniform(size=(E, HW, 2)) *
              np.array([w + 4, h + 4]) - 2).astype(np.float32)

    out = np.asarray(corr._lookup_level_tent(jnp.asarray(vol),
                                             jnp.asarray(coords), 3))
    expect = np.asarray(corr._lookup_level(jnp.asarray(vol),
                                           jnp.asarray(coords), 3))
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_rows_matches_gather(rng):
    E, h, w = 3, 8, 16
    HW = h * w
    vol = rng.normal(size=(E, HW, h, w)).astype(np.float32)
    coords = (rng.uniform(size=(E, HW, 2)) *
              np.array([w + 4, h + 4]) - 2).astype(np.float32)

    out = np.asarray(corr._lookup_level_rows(jnp.asarray(vol),
                                             jnp.asarray(coords), 3))
    expect = np.asarray(corr._lookup_level(jnp.asarray(vol),
                                           jnp.asarray(coords), 3))
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_dense_matches_gather(rng):
    E, h, w = 3, 8, 16
    HW = h * w
    vol = rng.normal(size=(E, HW, h, w)).astype(np.float32)
    coords = (rng.uniform(size=(E, HW, 2)) *
              np.array([w + 4, h + 4]) - 2).astype(np.float32)

    out = np.asarray(corr._lookup_level_dense(jnp.asarray(vol),
                                              jnp.asarray(coords), 3))
    expect = np.asarray(corr._lookup_level(jnp.asarray(vol),
                                           jnp.asarray(coords), 3))
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_onehot_pyramid_api(rng):
    E, h, w = 2, 8, 16
    f1 = jnp.asarray(rng.normal(size=(E, h, w, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(E, h, w, 8)).astype(np.float32))
    pyr = corr.build_pyramid(f1, f2)
    coords = jnp.asarray((rng.uniform(size=(E, h, w, 2)) *
                          np.array([w, h])).astype(np.float32))
    a = np.asarray(corr.lookup_pyramid(pyr, coords, impl="onehot"))
    b = np.asarray(corr.lookup_pyramid(pyr, coords, impl="gather"))
    np.testing.assert_allclose(a, b, atol=1e-4)
