"""Projective camera geometry with analytic Jacobians (pure JAX).

Re-derivation of /root/reference/droid_slam/geom/projective_ops.py and the
fused device math in /root/reference/src/droid_kernels.cu:185-433 as
edge-major, static-shape JAX ops. One implementation serves training
(differentiable, vmapped over batch) and inference (jitted into the BA step).

Shapes: poses [N,7] (SE3, [t,q]), disps [N,H,W] (inverse depth at 1/8 res),
intrinsics [N,4] = [fx,fy,cx,cy] (already divided by 8), edge lists ii/jj [E].
Outputs are edge-major [E,H,W,...].

Conventions:
  * homogeneous points X = [x, y, z, d] with d the inverse depth
    (iproj, projective_ops.py:23-44).
  * stereo edges (ii == jj) use the fixed rectified baseline
    Gij = [-0.1, 0, 0, identity] (projective_ops.py:176-178,
    droid_kernels.cu:228-238).
  * valid mask requires transformed z > MIN_DEPTH (= 0.2 in the Python ref,
    0.25 in the CUDA BA kernel; configurable here).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..lie import se3

MIN_DEPTH = 0.2  # projective_ops.py:6
MIN_DEPTH_BA = 0.25  # droid_kernels.cu MIN_DEPTH

_STEREO_GIJ = jnp.array([-0.1, 0, 0, 0, 0, 0, 1], dtype=jnp.float32)


def coords_grid(ht: int, wd: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel coordinate grid [ht, wd, 2] with (x, y) ordering
    (projective_ops.py:13-20)."""
    y, x = jnp.meshgrid(jnp.arange(ht, dtype=dtype), jnp.arange(wd, dtype=dtype),
                        indexing="ij")
    return jnp.stack([x, y], axis=-1)


def iproj(disps: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """Pinhole inverse projection: disparity maps -> homogeneous points
    [..., H, W, 4] (projective_ops.py:23-44)."""
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    x = (grid[..., 0] - cx) / fx
    y = (grid[..., 1] - cy) / fy
    return jnp.stack([x, y, jnp.ones_like(disps), disps], axis=-1)


def proj(X: jnp.ndarray, intrinsics: jnp.ndarray, jacobian: bool = False,
         return_depth: bool = False):
    """Pinhole projection of homogeneous points X[..., 4] (projective_ops.py:47-82).

    Returns (coords, Jp) with Jp the 2x4 projection Jacobian when requested.
    """
    fx, fy, cx, cy = jnp.moveaxis(intrinsics[..., None, None, :], -1, 0)
    x, y, z, w = jnp.moveaxis(X, -1, 0)
    z = jnp.where(z < 0.5 * MIN_DEPTH, jnp.ones_like(z), z)
    d = 1.0 / z

    u = fx * (x * d) + cx
    v = fy * (y * d) + cy
    if return_depth:
        coords = jnp.stack([u, v, w * d], axis=-1)
    else:
        coords = jnp.stack([u, v], axis=-1)

    if not jacobian:
        return coords, None

    o = jnp.zeros_like(d)
    Jp = jnp.stack(
        [fx * d, o, -fx * x * d * d, o,
         o, fy * d, -fy * y * d * d, o],
        axis=-1,
    ).reshape(coords.shape[:-1] + (2, 4))
    return coords, Jp


def actp(Gij: jnp.ndarray, X0: jnp.ndarray, jacobian: bool = False):
    """SE3 action on homogeneous point clouds + 4x6 left-perturbation Jacobian
    (projective_ops.py:85-123). Gij broadcasts over trailing point dims."""
    X1 = se3.act(Gij[..., None, None, :], X0)
    if not jacobian:
        return X1, None

    x, y, z, d = jnp.moveaxis(X1, -1, 0)
    o = jnp.zeros_like(d)
    # d(G X)/d(eps) for left perturbation exp(eps) G: rows are output dims
    Ja = jnp.stack(
        [d, o, o, o, z, -y,
         o, d, o, -z, o, x,
         o, o, d, y, -x, o,
         o, o, o, o, o, o],
        axis=-1,
    ).reshape(X1.shape[:-1] + (4, 6))
    return X1, Ja


def relative_poses(poses: jnp.ndarray, ii: jnp.ndarray, jj: jnp.ndarray) -> jnp.ndarray:
    """Gij = poses[jj] * poses[ii]^-1 with the stereo-edge override
    (projective_ops.py:174-178)."""
    Gij = se3.relative(poses[ii], poses[jj])
    stereo = (ii == jj)[..., None]
    return jnp.where(stereo, _STEREO_GIJ.astype(Gij.dtype), Gij)


def projective_transform(poses, disps, intrinsics, ii, jj, jacobian=False,
                         return_depth=False, min_depth=MIN_DEPTH,
                         factored_jac=False):
    """Map pixels of frames ii into frames jj (projective_ops.py:165-198).

    Returns (coords [E,H,W,2(3)], valid [E,H,W,1], (Ji, Jj, Jz) | None).
    Ji/Jj are [E,H,W,2,6] pose Jacobians (left perturbation, Ji via the dual
    adjoint), Jz is [E,H,W,2,1] the inverse-depth Jacobian.

    With ``factored_jac`` Ji is returned as None: since Ji = -Jj @ Ad(Gij)
    with Ad constant over pixels, callers assembling Gauss-Newton blocks can
    derive every i-side block from the j-side contraction with one per-edge
    6x6 transform (ba/edge_terms.py) — skipping the [E,HW,2,6] Ji
    materialization and the per-pixel adjT entirely.
    """
    X0 = iproj(disps[ii], intrinsics[ii])
    Gij = relative_poses(poses, ii, jj)
    X1, Ja = actp(Gij, X0, jacobian=jacobian)
    coords, Jp = proj(X1, intrinsics[jj], jacobian=jacobian,
                      return_depth=return_depth)

    valid = ((X1[..., 2] > min_depth) & (X0[..., 2] > min_depth))
    valid = valid[..., None].astype(coords.dtype)

    if not jacobian:
        return coords, valid, None

    # Closed-form pose/depth Jacobians (droid_kernels.cu:321-361) —
    # elementwise VPU math; the equivalent Jp @ Ja product would lower to
    # per-pixel 2x4 @ 4x6 batched matmuls, which the MXU executes one tiny
    # matrix at a time (~15 ms per BA iteration vs <1 ms here).
    fx = intrinsics[jj][..., None, None, 0]
    fy = intrinsics[jj][..., None, None, 1]
    x, y, z, hcoord = jnp.moveaxis(X1, -1, 0)
    zsafe = jnp.where(z < 0.5 * min_depth, jnp.ones_like(z), z)
    d = 1.0 / zsafe
    d2 = d * d
    o = jnp.zeros_like(d)
    Jj_u = jnp.stack([fx * hcoord * d, o, -fx * x * hcoord * d2,
                      -fx * x * y * d2, fx * (1.0 + x * x * d2),
                      -fx * y * d], axis=-1)
    Jj_v = jnp.stack([o, fy * hcoord * d, -fy * y * hcoord * d2,
                      -fy * (1.0 + y * y * d2), fy * x * y * d2,
                      fy * x * d], axis=-1)
    Jj = jnp.stack([Jj_u, Jj_v], axis=-2)  # [E,H,W,2,6]
    Ji = None if factored_jac else -se3.adjT(Gij[..., None, None, None, :], Jj)

    # depth Jacobian: t_ij enters through the homogeneous coordinate
    tij = Gij[..., None, None, :3]
    Jz_u = fx * (tij[..., 0] * d - tij[..., 2] * x * d2)
    Jz_v = fy * (tij[..., 1] * d - tij[..., 2] * y * d2)
    Jz = jnp.stack([Jz_u, Jz_v], axis=-1)[..., None]  # [E,H,W,2,1]
    return coords, valid, (Ji, Jj, Jz)


def projmap(poses, disps, intrinsics, ii, jj):
    """Reprojection coordinate maps + validity per edge
    (droid_kernels.cu:436-525, exported as ``droid_backends.projmap`` at
    src/droid.cpp:252; unused by the pipeline — kept for op-inventory
    completeness).

    Returns (coords [E,H,W,2], valid [E,H,W,1]). Semantics match the kernel
    exactly: Gij = poses[jj] * poses[ii]^-1 with NO stereo override, coords
    fall back to the identity pixel grid where transformed z <= 0.01 (the
    kernel leaves its grid initialization untouched there), the division is
    by the true z (not the clamped-z ``proj`` path), and valid requires
    z > 0.25 (the CUDA MIN_DEPTH)."""
    ht, wd = disps.shape[-2:]
    X0 = iproj(disps[ii], intrinsics[ii])
    Gij = se3.relative(poses[ii], poses[jj])
    X1 = se3.act(Gij[..., None, None, :], X0)
    x, y, z = X1[..., 0], X1[..., 1], X1[..., 2]

    fx, fy, cx, cy = jnp.moveaxis(intrinsics[jj][..., None, None, :], -1, 0)
    front = z > 0.01
    d = 1.0 / jnp.where(front, z, jnp.ones_like(z))
    grid = coords_grid(ht, wd, dtype=disps.dtype)
    u = jnp.where(front, fx * (x * d) + cx, grid[..., 0])
    v = jnp.where(front, fy * (y * d) + cy, grid[..., 1])
    coords = jnp.stack([u, v], axis=-1)
    valid = (z > MIN_DEPTH_BA)[..., None].astype(coords.dtype)
    return coords, valid


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (projective_ops.py:201-214)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid, _ = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
