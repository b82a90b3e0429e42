"""Flow-magnitude frame distance (keyframing / edge-proposal metric).

JAX re-derivation of frame_distance_kernel
(/root/reference/src/droid_kernels.cu:527-666): the mean reprojection flow
between frames blended between a full-SE3 warp (weight beta) and a
translation-only warp (weight 1-beta); returns 1000.0 when fewer than 75% of
pixels land in front of the camera. The bidirectional mean mirrors
/root/reference/droid_slam/depth_video.py:181-211.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..lie import se3
from .projective import MIN_DEPTH_BA, coords_grid, iproj


def _directed_distance(poses, disps, intrinsics, ii, jj, beta):
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    grid = coords_grid(ht, wd, dtype=disps.dtype)  # [H,W,2] (x,y)

    X0 = iproj(disps[ii], jnp.broadcast_to(intrinsics, (ii.shape[0], 4)))
    Gij = se3.relative(poses[ii], poses[jj])

    def flow_mag(X1):
        z = X1[..., 2]
        zsafe = jnp.where(z <= 0, jnp.ones_like(z), z)
        u = fx * (X1[..., 0] / zsafe) + cx
        v = fy * (X1[..., 1] / zsafe) + cy
        du = u - grid[..., 0]
        dv = v - grid[..., 1]
        mag = jnp.sqrt(du * du + dv * dv)
        valid = (z > MIN_DEPTH_BA).astype(disps.dtype)
        return mag, valid

    # full SE3 warp
    X1_full = se3.act(Gij[:, None, None, :], X0)
    mag_f, val_f = flow_mag(X1_full)
    # translation-only warp: Xj = Xi + d * t_ij (droid_kernels.cu:627-638)
    X1_tr = X0.at[..., :3].add(X0[..., 3:4] * Gij[:, None, None, :3])
    mag_t, val_t = flow_mag(X1_tr)

    accum = beta * jnp.sum(mag_f * val_f, axis=(-2, -1)) + \
        (1.0 - beta) * jnp.sum(mag_t * val_t, axis=(-2, -1))
    valid = beta * jnp.sum(val_f, axis=(-2, -1)) + \
        (1.0 - beta) * jnp.sum(val_t, axis=(-2, -1))
    total = jnp.asarray(float(ht * wd), disps.dtype)

    frac = valid / (total + 1e-8)
    d = accum / jnp.where(valid > 0, valid, jnp.ones_like(valid))
    return jnp.where(frac < 0.75, jnp.full_like(d, 1000.0), d)


def frame_distance(poses, disps, intrinsics, ii, jj, beta=0.3,
                   bidirectional=True):
    """Distance for each edge (ii[k], jj[k]); intrinsics is the shared [4]
    vector (depth_video.py:196-206 passes intrinsics[0])."""
    d1 = _directed_distance(poses, disps, intrinsics, ii, jj, beta)
    if not bidirectional:
        return d1
    d2 = _directed_distance(poses, disps, intrinsics, jj, ii, beta)
    return 0.5 * (d1 + d2)


frame_distance_jit = jax.jit(frame_distance, static_argnames=("bidirectional",))
