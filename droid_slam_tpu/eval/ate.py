"""Trajectory evaluation: ATE with Umeyama (scale) alignment, RPE.

Replaces the reference's third-party evaluator stack
(/root/reference/thirdparty/tartanair_tools/evaluation/evaluate_ate_scale.py
and the `evo` package usage in evaluation_scripts/test_*.py) with a
self-contained numpy implementation.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = True):
    """Least-squares similarity transform aligning x -> y.

    x, y: [3, n]. Returns (R [3,3], t [3], s scalar) minimizing
    ||y - (s R x + t)||^2 (Umeyama 1991; evaluate_ate_scale.py:align).
    """
    mx = x.mean(axis=1, keepdims=True)
    my = y.mean(axis=1, keepdims=True)
    xc, yc = x - mx, y - my
    cov = yc @ xc.T / x.shape[1]
    U, d, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    var_x = (xc ** 2).sum() / x.shape[1]
    s = float(np.trace(np.diag(d) @ S) / var_x) if with_scale else 1.0
    t = (my - s * R @ mx)[:, 0]
    return R, t, s


def ate_rmse(est_xyz: np.ndarray, ref_xyz: np.ndarray, scale: bool = True):
    """ATE RMSE after (scaled) rigid alignment. est/ref: [n,3].
    Returns (rmse, per-frame errors, s)."""
    R, t, s = umeyama_alignment(est_xyz.T, ref_xyz.T, with_scale=scale)
    aligned = (s * R @ est_xyz.T + t[:, None]).T
    err = np.linalg.norm(aligned - ref_xyz, axis=1)
    return float(np.sqrt(np.mean(err ** 2))), err, s


def associate_timestamps(t_est, t_ref, max_dt=0.02):
    """Greedy nearest-timestamp association (rgbd benchmark convention)."""
    t_est = np.asarray(t_est, np.float64)
    t_ref = np.asarray(t_ref, np.float64)
    ii, jj = [], []
    used = set()
    for i, t in enumerate(t_est):
        j = int(np.argmin(np.abs(t_ref - t)))
        if abs(t_ref[j] - t) < max_dt and j not in used:
            ii.append(i); jj.append(j); used.add(j)
    return np.asarray(ii), np.asarray(jj)


def evaluate_ate(est_traj, ref_traj, t_est=None, t_ref=None, scale=True,
                 max_dt=0.02):
    """est/ref: [n,>=3] with xyz in the first 3 columns; optional timestamp
    association. Returns dict with ate_rmse, scale, n_matches."""
    est_xyz = np.asarray(est_traj)[:, :3]
    ref_xyz = np.asarray(ref_traj)[:, :3]
    if t_est is not None and t_ref is not None:
        ii, jj = associate_timestamps(t_est, t_ref, max_dt)
        est_xyz, ref_xyz = est_xyz[ii], ref_xyz[jj]
    else:
        n = min(len(est_xyz), len(ref_xyz))
        est_xyz, ref_xyz = est_xyz[:n], ref_xyz[:n]
    rmse, err, s = ate_rmse(est_xyz, ref_xyz, scale=scale)
    return {"ate_rmse": rmse, "scale": s, "n_matches": len(est_xyz),
            "errors": err}


def rpe(est_poses, ref_poses, delta: int = 1):
    """Relative pose error over frame pairs (evaluate_rpe.py semantics).
    est/ref: [n,7] pose arrays ([t,q], c2w). Returns (trans_rmse, rot_rmse
    radians)."""
    from ..lie import se3
    import jax.numpy as jnp

    est = jnp.asarray(est_poses, jnp.float32)
    ref = jnp.asarray(ref_poses, jnp.float32)
    n = min(est.shape[0], ref.shape[0]) - delta
    d_est = se3.mul(se3.inv(est[:n]), est[delta:n + delta])
    d_ref = se3.mul(se3.inv(ref[:n]), ref[delta:n + delta])
    e = se3.log(se3.mul(se3.inv(d_ref), d_est))
    te = np.asarray(jnp.linalg.norm(e[:, :3], axis=-1))
    re = np.asarray(jnp.linalg.norm(e[:, 3:], axis=-1))
    return float(np.sqrt(np.mean(te ** 2))), float(np.sqrt(np.mean(re ** 2)))
