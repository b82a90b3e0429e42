"""Visualization-support geometry: multiview depth-consistency filtering and
world-frame back-projection.

Parity with depth_filter_kernel (/root/reference/src/droid_kernels.cu:670-784)
and iproj_kernel (:788-859), consumed by the visualization/export paths
(visualization.py:105-114, view_reconstruction.py:29-33).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import se3
from .projective import coords_grid


@partial(jax.jit, static_argnames=())
def depth_filter(poses, disps, intrinsics, inds, thresh):
    """Count, for each queried frame and pixel, how many of the 6 temporal
    neighbors (ix-3..ix-1, ix+1..ix+3) confirm its depth within `thresh`
    (inverse-depth test against the 4 bilinear neighbors).

    poses [N,7], disps [N,h,w], intrinsics [4], inds [M], thresh [M].
    Returns counter [M,h,w] float.
    """
    N, h, w = disps.shape
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    grid = coords_grid(h, w, dtype=disps.dtype)

    def one_pair(ix, jx, t):
        valid_j = (jx >= 0) & (jx < N)
        jxc = jnp.clip(jx, 0, N - 1)
        Gij = se3.relative(poses[ix], poses[jxc])
        di = disps[ix]
        X = jnp.stack([(grid[..., 0] - cx) / fx, (grid[..., 1] - cy) / fy,
                       jnp.ones_like(di), di], axis=-1)
        Xj = se3.act(Gij, X)
        zsafe = jnp.where(Xj[..., 2] == 0, 1.0, Xj[..., 2])
        uj = fx * (Xj[..., 0] / zsafe) + cx
        vj = fy * (Xj[..., 1] / zsafe) + cy
        dj = Xj[..., 3] / zsafe

        u0 = jnp.floor(uj).astype(jnp.int32)
        v0 = jnp.floor(vj).astype(jnp.int32)
        inb = (u0 >= 0) & (v0 >= 0) & (u0 < w - 1) & (v0 < h - 1) & valid_j
        u0c = jnp.clip(u0, 0, w - 2)
        v0c = jnp.clip(v0, 0, h - 2)

        dmap = disps[jxc]
        zj = 1.0 / jnp.where(dj == 0, 1e-8, dj)
        ok = jnp.zeros_like(di, bool)
        for dv in (0, 1):
            for du in (0, 1):
                dn = dmap[v0c + dv, u0c + du]
                zn = 1.0 / jnp.where(dn == 0, 1e-8, dn)
                ok = ok | (jnp.abs(zj - zn) < t)
        return (ok & inb).astype(disps.dtype)

    def one_frame(ix, t):
        deltas = jnp.asarray([-1, -2, -3, 3, 4, 5])  # cu:704 neighbor map
        cnt = jnp.zeros((h, w), disps.dtype)
        for k in range(6):
            cnt = cnt + one_pair(ix, ix + deltas[k], t)
        return cnt

    return jax.vmap(one_frame)(inds, thresh)


@jax.jit
def iproj_points(poses, disps, intrinsics):
    """Back-project every pixel of every frame to world coordinates
    (iproj_kernel): returns [N,h,w,3]."""
    N, h, w = disps.shape
    fx, fy, cx, cy = intrinsics[0], intrinsics[1], intrinsics[2], intrinsics[3]
    grid = coords_grid(h, w, dtype=disps.dtype)
    d = jnp.where(disps == 0, 1e-8, disps)
    # camera-frame 3D point = [(u-cx)/fx, (v-cy)/fy, 1] / d
    Xc = jnp.stack([jnp.broadcast_to((grid[..., 0] - cx) / fx, disps.shape),
                    jnp.broadcast_to((grid[..., 1] - cy) / fy, disps.shape),
                    jnp.ones_like(disps)], axis=-1) / d[..., None]
    Ginv = se3.inv(poses)
    return se3.act3(Ginv[:, None, None, :], Xc)
