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


def _edge_dG(dP, Gs, ii, jj, do_scale):
    """Relative pose of the estimate over the edges, optionally scale-fit to
    the GT relative translations (the monocular gauge, losses.py:47-50)."""
    dG = se3.mul(Gs[jj], se3.inv(Gs[ii]))
    if do_scale:
        s = fit_scale(dP[None], dG[None])[0]
        dG = jnp.concatenate([dG[..., :3] * s, dG[..., 3:]], -1)
    return dG


def geodesic_step(dP, Gs, ii, jj, do_scale=True):
    """Unweighted geodesic term of ONE iterate — the scan-friendly core of
    `geodesic_loss` (dP = GT relative poses, precomputed once)."""
    dG = _edge_dG(dP, Gs, ii, jj, do_scale)
    d = se3.log(se3.mul(dG, se3.inv(dP)))
    tau, phi = d[..., :3], d[..., 3:6]
    return (jnp.mean(jnp.linalg.norm(tau, axis=-1))
            + jnp.mean(jnp.linalg.norm(phi, axis=-1)))


def geodesic_metrics(dP, Gs, ii, jj, do_scale=True):
    """Rotation/translation error metrics of the FINAL iterate
    (losses.py:60-71)."""
    dG = _edge_dG(dP, Gs, ii, jj, do_scale)
    dE = sim3.from_se3(se3.mul(dG, se3.inv(dP)))
    r_err = (180.0 / np.pi) * jnp.linalg.norm(
        se3.so3_log(dE[..., 3:7]), axis=-1)
    t_err = jnp.linalg.norm(dE[..., :3], axis=-1)
    return {
        "rot_error": jnp.mean(r_err),
        "tr_error": jnp.mean(t_err),
        "bad_rot": jnp.mean((r_err < 0.1).astype(jnp.float32)),
        "bad_tr": jnp.mean((t_err < 0.01).astype(jnp.float32)),
    }


def geodesic_loss(Ps, Gs_list, ii, jj, gamma=0.9, do_scale=True):
    """losses.py:30-74. Ps [N,7] GT, Gs_list: list of [N,7] estimates."""
    dP = se3.mul(Ps[jj], se3.inv(Ps[ii]))
    n = len(Gs_list)
    total = 0.0
    for i, Gs in enumerate(Gs_list):
        w = gamma ** (n - i - 1)
        total = total + w * geodesic_step(dP, Gs, ii, jj, do_scale)
    metrics = geodesic_metrics(dP, Gs_list[-1], ii, jj, do_scale)
    return total, metrics


def residual_loss(residuals, gamma=0.9):
    """losses.py:77-86."""
    n = len(residuals)
    total = 0.0
    for i, r in enumerate(residuals):
        total = total + gamma ** (n - i - 1) * jnp.mean(jnp.abs(r))
    return total, {"residual": total}


def adjacent_pairs(N):
    """Adjacent-frame edge lists (|i-j| == 1) used by the flow loss."""
    ii, jj = [], []
    for a in range(N):
        for b in range(N):
            if abs(a - b) == 1:
                ii.append(a); jj.append(b)
    return jnp.asarray(ii), jnp.asarray(jj)


def flow_gt(Ps, disps, intrinsics, ii, jj):
    """GT induced flow endpoints + validity over the adjacent pairs —
    precomputed once outside the iteration loop/scan."""
    coords0, val0, _ = pops.projective_transform(Ps, disps, intrinsics,
                                                 ii, jj)
    val0 = val0 * (disps[ii] > 0).astype(val0.dtype)[..., None]
    return coords0, val0


def flow_step(coords0, val0, Gs, disp_est, intrinsics, ii, jj):
    """Unweighted flow-EPE term of ONE iterate; also returns (epe, v) so the
    final iterate's metrics can be formed without recomputation.

    The EPE norm is computed with a masked-safe sqrt: `norm(x)` has a NaN
    gradient at exactly x = 0, and the reference's `v * norm(...)` masking
    (losses.py:108-110) turns that into 0 * NaN = NaN in reverse mode.
    Values are identical; only the (undefined) gradient at the zero point
    becomes 0."""
    coords1, val1, _ = pops.projective_transform(
        Gs, disp_est, intrinsics, ii, jj)
    v = (val0 * val1)[..., 0]
    diff = coords1 - coords0
    sq = jnp.sum(diff * diff, axis=-1)
    epe = jnp.where(sq > 0, v * jnp.sqrt(jnp.where(sq > 0, sq, 1.0)), 0.0)
    return jnp.mean(epe), epe, v


def flow_metrics(epe, v):
    """Masked EPE / 1px metrics of the final iterate (losses.py:111-116)."""
    denom = jnp.maximum(jnp.sum(v > 0.5), 1)
    masked = jnp.where(v > 0.5, epe, 0.0)
    return {
        "f_error": jnp.sum(masked) / denom,
        "1px": jnp.sum(jnp.where(v > 0.5, (epe < 1.0).astype(jnp.float32),
                                 0.0)) / denom,
    }


def flow_loss(Ps, disps, poses_est, disps_est, intrinsics, gamma=0.9):
    """losses.py:89-118: EPE on the flow induced between adjacent frames.
    Ps [N,7], disps [N,h,w] GT; *_est: lists of estimates."""
    N = Ps.shape[0]
    ii, jj = adjacent_pairs(N)
    coords0, val0 = flow_gt(Ps, disps, intrinsics, ii, jj)

    n = len(poses_est)
    total = 0.0
    epe = None
    v = None
    for i in range(n):
        w = gamma ** (n - i - 1)
        term, epe, v = flow_step(coords0, val0, poses_est[i], disps_est[i],
                                 intrinsics, ii, jj)
        total = total + w * term
    return total, flow_metrics(epe, v)
