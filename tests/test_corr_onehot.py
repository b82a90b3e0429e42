"""One-hot matmul lookup formulation vs the gather reference."""

import numpy as np
import jax.numpy as jnp
import pytest

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


@pytest.mark.parametrize("cols_order", ["ah", "ha"])
def test_dense_cm_matches_gather(rng, cols_order):
    """Channel-major lookup (pixels-in-lanes volume layout) vs gather,
    under both x-pass intermediate orderings (lookup_pyramid_cm selects
    per level from CM_COLS_ORDERS)."""
    E, h, w = 3, 8, 16
    HW = h * w
    vol = rng.normal(size=(E, HW, h, w)).astype(np.float32)
    vol_cm = jnp.asarray(vol.transpose(0, 2, 3, 1))
    coords = (rng.uniform(size=(E, HW, 2)) *
              np.array([w + 4, h + 4]) - 2).astype(np.float32)

    out = np.asarray(corr._lookup_level_dense_cm(
        vol_cm, jnp.asarray(coords), 3, out_dtype=jnp.float32,
        cols_order=cols_order))
    expect = np.asarray(corr._lookup_level(jnp.asarray(vol),
                                           jnp.asarray(coords), 3))
    np.testing.assert_allclose(out.transpose(0, 2, 1), expect, atol=1e-4)


def test_cm_pyramid_matches_std(rng):
    """build_pyramid_cm levels == transposed build_pyramid levels (up to
    f32 reassociation: cm pools fmap2 BEFORE the dot — mean-of-dots ==
    dot-with-mean — while std pools the volume after), and the cm pyramid
    lookup matches the standard dense path to the same tolerance."""
    E, h, w = 2, 8, 16
    f1 = jnp.asarray(rng.normal(size=(E, h, w, 8)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(E, h, w, 8)).astype(np.float32))
    pyr = corr.build_pyramid(f1, f2)
    pyr_cm = corr.build_pyramid_cm(f1, f2)
    # L0 has no pooling: bit-equal. Pooled levels: reassociation only.
    np.testing.assert_array_equal(
        np.asarray(pyr[0]), np.asarray(pyr_cm[0]).transpose(0, 3, 1, 2))
    for v, vc in zip(pyr[1:], pyr_cm[1:]):
        np.testing.assert_allclose(np.asarray(v),
                                   np.asarray(vc).transpose(0, 3, 1, 2),
                                   rtol=1e-5, atol=1e-5)
    coords = jnp.asarray((rng.uniform(size=(E, h * w, 2)) *
                          np.array([w, h])).astype(np.float32))
    a = np.asarray(corr.lookup_pyramid_cm(pyr_cm, coords,
                                          out_dtype=jnp.float32))
    b = np.concatenate(
        [np.asarray(corr._lookup_level_dense(v, coords / (2.0 ** l), 3))
         for l, v in enumerate(pyr)], axis=-1)
    np.testing.assert_allclose(a.transpose(0, 2, 1), b, rtol=1e-5, atol=1e-5)
