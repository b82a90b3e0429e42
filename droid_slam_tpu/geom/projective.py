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
                         return_depth=False, min_depth=MIN_DEPTH):
    """Map pixels of frames ii into frames jj (projective_ops.py:165-198).

    Returns (coords [E,H,W,2(3)], valid [E,H,W,1], (Ji, Jj, Jz) | None).
    Ji/Jj are [E,H,W,2,6] pose Jacobians (left perturbation, Ji via the dual
    adjoint), Jz is [E,H,W,2,1] the inverse-depth Jacobian.
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

    # geometry Jacobians must stay true fp32: force full-precision contractions
    # (TPU matmuls default to bf16 passes otherwise)
    Jj = jnp.einsum("...ij,...jk->...ik", Jp, Ja, precision="highest")
    Ji = -se3.adjT(Gij[..., None, None, None, :], Jj)
    # depth Jacobian: d(coords)/d(disp) = Jp @ (Gij * e_w)
    Jz_pt = se3.act(Gij, jnp.array([0.0, 0.0, 0.0, 1.0], dtype=coords.dtype))
    Jz = jnp.einsum("...ij,...j->...i", Jp, Jz_pt[..., None, None, :],
                    precision="highest")[..., None]
    return coords, valid, (Ji, Jj, Jz)


def induced_flow(poses, disps, intrinsics, ii, jj):
    """Optical flow induced by camera motion (projective_ops.py:201-214)."""
    ht, wd = disps.shape[-2:]
    coords0 = coords_grid(ht, wd, dtype=disps.dtype)
    coords1, valid, _ = projective_transform(poses, disps, intrinsics, ii, jj)
    return coords1[..., :2] - coords0, valid
