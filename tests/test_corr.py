"""Correlation op tests vs a naive numpy transcription of the CUDA kernels
(src/correlation_kernels.cu:21-71, src/altcorr_kernel.cu:24-171)."""

import numpy as np
import jax.numpy as jnp

from droid_slam_tpu.ops import corr


def naive_corr_index(volume, coords, r):
    """corr_index_forward_kernel semantics. volume [E,HW,h2,w2],
    coords [E,HW,2] -> [E,HW,(2r+1)^2] x-offset-major."""
    E, HW, h2, w2 = volume.shape
    rd = 2 * r + 1
    out = np.zeros((E, HW, rd, rd), np.float64)
    for e in range(E):
        for p in range(HW):
            x0, y0 = coords[e, p]
            fx, fy = np.floor(x0), np.floor(y0)
            dx, dy = x0 - fx, y0 - fy
            for i in range(rd + 1):
                for j in range(rd + 1):
                    x1 = int(fx) - r + i
                    y1 = int(fy) - r + j
                    if 0 <= x1 < w2 and 0 <= y1 < h2:
                        s = volume[e, p, y1, x1]
                        if i > 0 and j > 0:
                            out[e, p, i - 1, j - 1] += s * dx * dy
                        if i > 0 and j < rd:
                            out[e, p, i - 1, j] += s * dx * (1 - dy)
                        if i < rd and j > 0:
                            out[e, p, i, j - 1] += s * (1 - dx) * dy
                        if i < rd and j < rd:
                            out[e, p, i, j] += s * (1 - dx) * (1 - dy)
    return out.reshape(E, HW, rd * rd)


def test_volume_matches_dot(rng):
    E, h, w, C = 2, 3, 4, 8
    f1 = rng.normal(size=(E, h, w, C)).astype(np.float32)
    f2 = rng.normal(size=(E, h, w, C)).astype(np.float32)
    vol = np.asarray(corr.build_volume(jnp.asarray(f1), jnp.asarray(f2)))
    expect = np.einsum("ehwc,eHWc->ehwHW", f1 / 4, f2 / 4).reshape(
        E, h * w, h, w)
    np.testing.assert_allclose(vol, expect, atol=1e-5)


def test_lookup_matches_naive(rng):
    E, h, w = 2, 4, 6
    r = 2
    vol = rng.normal(size=(E, h * w, h, w)).astype(np.float32)
    coords = (rng.uniform(size=(E, h * w, 2)) *
              np.array([w + 2, h + 2]) - 1).astype(np.float32)
    out = np.asarray(corr._lookup_level(jnp.asarray(vol), jnp.asarray(coords), r))
    expect = naive_corr_index(vol, coords, r)
    np.testing.assert_allclose(out, expect, atol=1e-4)


def test_alt_matches_volume_path(rng):
    """altcorr on level 0 must equal the volume-lookup on level 0 (same math,
    different factorization)."""
    N, h, w, C = 3, 4, 6, 8
    r = 3
    fmaps = rng.normal(size=(N, h, w, C)).astype(np.float32)
    ii = np.array([0, 1]); jj = np.array([1, 2])
    coords = (rng.uniform(size=(2, h, w, 2)) *
              np.array([w, h])).astype(np.float32)

    pyr = corr.build_fmap_pyramid(jnp.asarray(fmaps), num_levels=1)
    alt = np.asarray(corr.alt_lookup(pyr, jnp.asarray(coords),
                                     jnp.asarray(ii), jnp.asarray(jj),
                                     radius=r))

    vol_pyr = corr.build_pyramid(jnp.asarray(fmaps[ii]),
                                 jnp.asarray(fmaps[jj]), num_levels=1)
    volpath = np.asarray(corr.lookup_pyramid(vol_pyr, jnp.asarray(coords),
                                             radius=r))
    np.testing.assert_allclose(alt, volpath, atol=1e-4)


def test_pyramid_levels_scale_coords(rng):
    """Level-l lookup must sample the pooled volume at coords/2^l."""
    E, h, w, C = 1, 8, 8, 4
    f1 = rng.normal(size=(E, h, w, C)).astype(np.float32)
    f2 = rng.normal(size=(E, h, w, C)).astype(np.float32)
    pyr = corr.build_pyramid(jnp.asarray(f1), jnp.asarray(f2), num_levels=2)
    coords = np.tile(np.array([4.0, 4.0], np.float32), (E, h, w, 1))
    out = np.asarray(corr.lookup_pyramid(pyr, jnp.asarray(coords), radius=1))
    assert out.shape == (E, h, w, 2 * 9)
    # level 1 center tap = pooled volume at (2,2)
    pooled = np.asarray(pyr[1]).reshape(E, h * w, 4, 4)
    np.testing.assert_allclose(out[0, 0, 0, 9 + 4], pooled[0, 0, 2, 2],
                               atol=1e-5)
