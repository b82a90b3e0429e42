"""Training losses: geodesic pose loss, residual loss, flow loss.

Parity with /root/reference/droid_slam/geom/losses.py — gamma-weighted over
the iteration history, Sim3 scale-fitting for the monocular gauge, EPE flow
loss on adjacent-frame induced flow. All functions are differentiable and
jit/vmap friendly; metrics are returned as a dict of scalars.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import projective as pops
from ..lie import se3, sim3


def fit_scale(dP, dG):
    """Least-squares relative scale between edge translation sets
    (losses.py:21-27, translations detached). dP/dG: [...,E,7]."""
    t1 = jax.lax.stop_gradient(dP[..., :3]).reshape(dP.shape[:-2] + (-1,))
    t2 = jax.lax.stop_gradient(dG[..., :3]).reshape(dG.shape[:-2] + (-1,))
    return jnp.sum(t1 * t2, -1) / (jnp.sum(t2 * t2, -1) + 1e-8)


def geodesic_loss(Ps, Gs_list, ii, jj, gamma=0.9, do_scale=True):
    """losses.py:30-74. Ps [N,7] GT, Gs_list: list of [N,7] estimates."""
    dP = se3.mul(Ps[jj], se3.inv(Ps[ii]))
    n = len(Gs_list)
    total = 0.0
    for i, Gs in enumerate(Gs_list):
        w = gamma ** (n - i - 1)
        dG = se3.mul(Gs[jj], se3.inv(Gs[ii]))
        if do_scale:
            s = fit_scale(dP[None], dG[None])[0]
            dG = jnp.concatenate([dG[..., :3] * s, dG[..., 3:]], -1)
        d = se3.log(se3.mul(dG, se3.inv(dP)))
        tau, phi = d[..., :3], d[..., 3:6]
        total = total + w * (jnp.mean(jnp.linalg.norm(tau, axis=-1))
                             + jnp.mean(jnp.linalg.norm(phi, axis=-1)))

    dE = sim3.from_se3(se3.mul(dG, se3.inv(dP)))
    r_err = (180.0 / np.pi) * jnp.linalg.norm(
        se3.so3_log(dE[..., 3:7]), axis=-1)
    t_err = jnp.linalg.norm(dE[..., :3], axis=-1)
    metrics = {
        "rot_error": jnp.mean(r_err),
        "tr_error": jnp.mean(t_err),
        "bad_rot": jnp.mean((r_err < 0.1).astype(jnp.float32)),
        "bad_tr": jnp.mean((t_err < 0.01).astype(jnp.float32)),
    }
    return total, metrics


def residual_loss(residuals, gamma=0.9):
    """losses.py:77-86."""
    n = len(residuals)
    total = 0.0
    for i, r in enumerate(residuals):
        total = total + gamma ** (n - i - 1) * jnp.mean(jnp.abs(r))
    return total, {"residual": total}


def flow_loss(Ps, disps, poses_est, disps_est, intrinsics, gamma=0.9):
    """losses.py:89-118: EPE on the flow induced between adjacent frames.
    Ps [N,7], disps [N,h,w] GT; *_est: lists of estimates."""
    N = Ps.shape[0]
    ii, jj = [], []
    for a in range(N):
        for b in range(N):
            if abs(a - b) == 1:
                ii.append(a); jj.append(b)
    ii = jnp.asarray(ii); jj = jnp.asarray(jj)

    coords0, val0, _ = pops.projective_transform(Ps, disps, intrinsics, ii, jj)
    val0 = val0 * (disps[ii] > 0).astype(val0.dtype)[..., None]

    n = len(poses_est)
    total = 0.0
    epe = None
    v = None
    for i in range(n):
        w = gamma ** (n - i - 1)
        coords1, val1, _ = pops.projective_transform(
            poses_est[i], disps_est[i], intrinsics, ii, jj)
        v = (val0 * val1)[..., 0]
        epe = v * jnp.linalg.norm(coords1 - coords0, axis=-1)
        total = total + w * jnp.mean(epe)

    denom = jnp.maximum(jnp.sum(v > 0.5), 1)
    masked = jnp.where(v > 0.5, epe, 0.0)
    metrics = {
        "f_error": jnp.sum(masked) / denom,
        "1px": jnp.sum(jnp.where(v > 0.5, (epe < 1.0).astype(jnp.float32),
                                 0.0)) / denom,
    }
    return total, metrics
