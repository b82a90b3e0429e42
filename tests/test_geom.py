"""Projective-geometry tests: Jacobians vs numeric differentiation, warp
consistency on synthetic scenes (test seams identified in SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_tpu.geom import projective as pops
from droid_slam_tpu.geom.distance import frame_distance
from droid_slam_tpu.lie import se3


def make_scene(rng, n=4, h=6, w=8):
    """Random poses near identity, random positive disparities."""
    xi = rng.normal(size=(n, 6)).astype(np.float32) * 0.05
    poses = np.asarray(se3.exp(jnp.asarray(xi)))
    disps = (0.5 + rng.uniform(size=(n, h, w))).astype(np.float32)
    intr = np.tile(np.array([24.0, 24.0, w / 2, h / 2], np.float32), (n, 1))
    return jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(intr)


def test_iproj_proj_roundtrip(rng):
    poses, disps, intr = make_scene(rng)
    X = pops.iproj(disps, intr)
    coords, _ = pops.proj(X, intr)
    grid = pops.coords_grid(disps.shape[1], disps.shape[2])
    np.testing.assert_allclose(np.asarray(coords),
                               np.broadcast_to(np.asarray(grid), coords.shape),
                               atol=1e-4)


def test_projective_transform_identity(rng):
    poses, disps, intr = make_scene(rng)
    eye = jnp.broadcast_to(se3.identity((), jnp.float32), poses.shape)
    ii = jnp.asarray([0, 1]); jj = jnp.asarray([0 + 1, 2])
    # same pose for all frames -> warp is identity
    coords, valid, _ = pops.projective_transform(eye, disps, intr, ii, jj)
    grid = pops.coords_grid(disps.shape[1], disps.shape[2])
    np.testing.assert_allclose(np.asarray(coords),
                               np.broadcast_to(np.asarray(grid), coords.shape),
                               atol=1e-4)
    assert np.all(np.asarray(valid) == 1.0)


def test_pose_jacobians_vs_numeric(rng):
    """Ji/Jj from projective_transform match finite differences of the
    reprojection w.r.t. left pose perturbations."""
    poses, disps, intr = make_scene(rng)
    ii = jnp.asarray([0]); jj = jnp.asarray([1])
    coords0, _, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intr, ii, jj, jacobian=True)

    def warp(eps_i, eps_j):
        p = poses
        p = p.at[0].set(se3.retr(p[0], eps_i))
        p = p.at[1].set(se3.retr(p[1], eps_j))
        c, _, _ = pops.projective_transform(p, disps, intr, ii, jj)
        return c

    z6 = jnp.zeros(6)
    num_Ji = jax.jacfwd(lambda e: warp(e, z6))(z6)  # [1,H,W,2,6]
    num_Jj = jax.jacfwd(lambda e: warp(z6, e))(z6)
    np.testing.assert_allclose(np.asarray(Ji), np.asarray(num_Ji), atol=1e-3)
    np.testing.assert_allclose(np.asarray(Jj), np.asarray(num_Jj), atol=1e-3)

    # depth jacobian via autodiff on disparities
    def warp_d(d):
        c, _, _ = pops.projective_transform(poses, disps.at[0].set(d), intr, ii, jj)
        return c
    num_Jz_full = jax.jacfwd(warp_d)(disps[0])  # [1,H,W,2,H,W]
    h, w = disps.shape[1:]
    num_Jz = np.asarray(num_Jz_full).reshape(h * w, 2, h * w)[
        np.arange(h * w), :, np.arange(h * w)].reshape(1, h, w, 2, 1)
    np.testing.assert_allclose(np.asarray(Jz), num_Jz, atol=1e-3)


def test_stereo_edge_uses_baseline(rng):
    poses, disps, intr = make_scene(rng)
    ii = jnp.asarray([2]); jj = jnp.asarray([2])
    coords, _, _ = pops.projective_transform(poses, disps, intr, ii, jj)
    # stereo baseline t=[-0.1,0,0]: expected shift of -0.1 * fx * disp in x
    grid = pops.coords_grid(disps.shape[1], disps.shape[2])
    expect_x = np.asarray(grid[..., 0]) - 0.1 * 24.0 * np.asarray(disps[2])
    np.testing.assert_allclose(np.asarray(coords[0, ..., 0]), expect_x, atol=1e-4)
    np.testing.assert_allclose(np.asarray(coords[0, ..., 1]),
                               np.broadcast_to(np.asarray(grid[..., 1]),
                                               coords.shape[1:3]), atol=1e-4)


def test_induced_flow_zero_for_identity(rng):
    poses, disps, intr = make_scene(rng)
    eye = jnp.broadcast_to(se3.identity((), jnp.float32), poses.shape)
    flow, valid = pops.induced_flow(eye, disps, intr, jnp.asarray([0]), jnp.asarray([1]))
    np.testing.assert_allclose(np.asarray(flow), 0, atol=1e-4)


def test_frame_distance_properties(rng):
    poses, disps, intr = make_scene(rng, n=3, h=8, w=16)
    ii = jnp.asarray([0, 0]); jj = jnp.asarray([0, 1])
    d = np.asarray(frame_distance(poses, disps, intr[0], ii, jj, beta=0.3))
    # self-distance must be ~0; distinct poses give positive distance
    assert abs(d[0]) < 1e-3
    assert d[1] > 0

    # translation along x of magnitude fx*dx*disp: check analytic value
    p2 = jnp.asarray(np.stack([np.array([0, 0, 0, 0, 0, 0, 1], np.float32),
                               np.array([0.2, 0, 0, 0, 0, 0, 1], np.float32)]))
    d2 = (1.0 * jnp.ones((2, 8, 16), jnp.float32))
    dd = np.asarray(frame_distance(p2, d2, intr[0], jnp.asarray([0]),
                                   jnp.asarray([1]), beta=0.5))
    # flow = fx * 0.2 * disp = 24*0.2 = 4.8 for every pixel, both warps equal
    np.testing.assert_allclose(dd, 4.8, atol=1e-3)


def test_projmap_matches_projective_transform(rng):
    """projmap (droid_kernels.cu:436-525) agrees with projective_transform
    where depths are comfortably in front of both cameras, falls back to the
    identity grid behind z=0.01, and gates valid at z > 0.25."""
    n, h, w = 4, 12, 16
    poses = se3.exp(jnp.asarray(
        0.05 * rng.normal(size=(n, 6)).astype(np.float32)))
    disps = jnp.asarray(
        (0.8 + 0.4 * rng.random(size=(n, h, w))).astype(np.float32))
    intr = jnp.broadcast_to(
        jnp.asarray([20.0, 20.0, w / 2, h / 2], jnp.float32), (n, 4))
    ii = jnp.asarray([0, 1, 2])
    jj = jnp.asarray([1, 2, 3])

    coords, valid = pops.projmap(poses, disps, intr, ii, jj)
    ref_coords, ref_valid, _ = pops.projective_transform(
        poses, disps, intr, ii, jj)
    assert np.asarray(valid).min() == 1.0  # all in front here
    np.testing.assert_allclose(np.asarray(coords), np.asarray(ref_coords),
                               atol=1e-4)

    # a pose far behind the scene: grid fallback + invalid
    # poses map world->camera: z_cam = z_world + t_z, so t_z = -50 puts
    # every point far behind camera j=1
    far = poses.at[1, 2].set(-50.0)
    coords2, valid2 = pops.projmap(far, disps, intr, jnp.asarray([0]),
                                   jnp.asarray([1]))
    grid = np.asarray(pops.coords_grid(h, w))
    assert np.asarray(valid2).max() == 0.0
    np.testing.assert_allclose(np.asarray(coords2)[0], grid, atol=1e-6)
