"""Pose-solve precision at full buffer scale (VERDICT r2 item 5).

The reference solves the Schur-reduced pose system in float64 on the CPU
(Eigen SimplicialLLT, /root/reference/src/droid_kernels.cu:1140-1222); this
framework solves on-device in fp32 Cholesky + one iterative-refinement step
(ba/solver.py). The buffer allows 512-1000 keyframes (config.py presets), so
the fp32 path must hold conditioning at a 6x512..6x1000 system.

This builds the REAL Gauss-Newton pose system of a global-BA-sized problem —
proximity-style edge set over a smooth synthetic trajectory, the same
linearize/pose_blocks/depth_blocks as ba_iterations, the same grouped Schur
reduction and damping — then compares the fp32+refine solve against a float64
numpy solve of the identical system, with condition numbers logged.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from droid_slam_tpu.ba import edge_terms
from droid_slam_tpu.ba.solver import solve_psd
from droid_slam_tpu.lie import se3


def _proximity_edges(t, rad=2, extra_stride=9, extra_span=5):
    """Backend-shaped edge set: dense +/-rad neighborhood plus sparse
    longer-range links (what add_proximity_factors produces on a smooth
    trajectory, factor_graph.py:346-412)."""
    ii, jj = [], []
    for i in range(t):
        for r in range(1, rad + 1):
            if i + r < t:
                ii.append(i); jj.append(i + r)
                ii.append(i + r); jj.append(i)
    for i in range(0, t - extra_span, extra_stride):
        for s in (extra_span, extra_span + 2):
            if i + s < t:
                ii.append(i); jj.append(i + s)
    return np.asarray(ii), np.asarray(jj)


def _build_system(t, h, w, seed=0, lm=1e-5, ep=1e-2):
    """Assemble (M_damped fp64, rhs fp64) for one GN iteration at scale,
    grouped-Schur like ba_iterations (never materializing the dense E)."""
    from droid_slam_tpu.data.synthetic import random_trajectory, \
        poses_c2w_from_mats

    rng = np.random.default_rng(seed)
    hw = h * w
    Rs, ts_ = random_trajectory(t, rng, step=0.05, rot_step=0.015)
    poses = jnp.asarray(np.asarray(
        se3.inv(jnp.asarray(poses_c2w_from_mats(Rs, ts_)))))
    disps = jnp.asarray(rng.uniform(0.7, 1.3, (t, h, w)).astype(np.float32))
    intr = jnp.broadcast_to(
        jnp.asarray([0.8 * w, 0.8 * w, w / 2, h / 2], jnp.float32), (t, 4))

    ii, jj = _proximity_edges(t)
    E = len(ii)
    t0, t1 = 1, t

    # realistic targets: true reprojection + flow-scale noise; mid confidences
    from droid_slam_tpu.geom import projective as pops
    coords, _, _ = pops.projective_transform(poses, disps, intr,
                                             jnp.asarray(ii), jnp.asarray(jj))
    tgt = (np.asarray(coords).reshape(E, hw, 2).transpose(0, 2, 1)
           + rng.normal(0, 1.5, (E, 2, hw))).astype(np.float32)
    wgt = rng.uniform(0.2, 0.9, (E, 2, hw)).astype(np.float32)

    terms = edge_terms.linearize(poses, disps, intr, jnp.asarray(tgt),
                                 jnp.asarray(wgt), jnp.asarray(ii),
                                 jnp.asarray(jj), min_depth=0.25)
    Hii, Hij, Hji, Hjj, vi, vj = (np.asarray(x, np.float64) for x in
                                  edge_terms.pose_blocks(terms))
    Ei, Ej, Cz, bz = (np.asarray(x, np.float64) for x in
                      edge_terms.depth_blocks(terms))

    P = t1 - t0
    A = np.zeros((P, P, 6, 6))
    v = np.zeros((P, 6))
    bi, bj = ii - t0, jj - t0
    np.add.at(A, (np.clip(bi, 0, P - 1), np.clip(bi, 0, P - 1)),
              Hii * (bi >= 0)[:, None, None])
    np.add.at(A, (np.clip(bi, 0, P - 1), np.clip(bj, 0, P - 1)),
              Hij * ((bi >= 0) & (bj >= 0))[:, None, None])
    np.add.at(A, (np.clip(bj, 0, P - 1), np.clip(bi, 0, P - 1)),
              Hji * ((bi >= 0) & (bj >= 0))[:, None, None])
    np.add.at(A, (np.clip(bj, 0, P - 1), np.clip(bj, 0, P - 1)),
              Hjj * (bj >= 0)[:, None, None])
    np.add.at(v, np.clip(bi, 0, P - 1), vi * (bi >= 0)[:, None])
    np.add.at(v, np.clip(bj, 0, P - 1), vj * (bj >= 0)[:, None])

    # depth diag + damping (eta ~ frontend scale)
    eta = 1e-4
    C = np.zeros((t, hw))
    wz = np.zeros((t, hw))
    np.add.at(C, ii, Cz)
    np.add.at(wz, ii, bz)
    C += eta
    Q = 1.0 / C

    # grouped Schur: rows = per-frame accumulated Ei + per-edge Ej
    Ei_acc = np.zeros((t, 6, hw))
    np.add.at(Ei_acc, ii, Ei)
    rows_by_k = {k: [] for k in range(t)}
    # window rows (pose == depth frame), only poses in [t0, t1)
    row_mats, row_pose, row_k = [], [], []
    for k in range(t):
        row_mats.append(Ei_acc[k]); row_pose.append(k - t0); row_k.append(k)
    for e in range(E):
        row_mats.append(Ej[e]); row_pose.append(jj[e] - t0); row_k.append(ii[e])
    for r, k in enumerate(row_k):
        if 0 <= row_pose[r] < P:
            rows_by_k[k].append(r)

    S = np.zeros((P, P, 6, 6))
    v_s = np.zeros((P, 6))
    for k in range(t):
        rows = rows_by_k[k]
        if not rows:
            continue
        Ek = np.stack([row_mats[r] for r in rows])        # [R,6,hw]
        G = np.einsum("rdh,sfh->rsdf", Ek * Q[k], Ek)
        qw = Q[k] * wz[k]
        for a, ra in enumerate(rows):
            pa = row_pose[ra]
            v_s[pa] += row_mats[ra] @ qw
            for b, rb in enumerate(rows):
                S[pa, row_pose[rb]] += G[a, b]

    M = (A - S).transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    rhs = (v - v_s).reshape(P * 6)
    M = M + np.diag(ep + lm * np.diag(M))
    return M, rhs


@pytest.mark.slow
@pytest.mark.parametrize("t", [520, 1000])
def test_fp32_refined_solve_matches_fp64_at_scale(t):
    h, w = 8, 12
    M64, rhs64 = _build_system(t, h, w)

    dx64 = np.linalg.solve(M64, rhs64)

    M32 = jnp.asarray(M64.astype(np.float32))
    r32 = jnp.asarray(rhs64.astype(np.float32))
    dx32 = np.asarray(solve_psd(M32, r32, refine_steps=1), np.float64)

    # conditioning of the damped system (logged for the record)
    ev = np.linalg.eigvalsh(M64)
    cond = ev[-1] / max(ev[0], 1e-300)
    rel = np.linalg.norm(dx32 - dx64) / max(np.linalg.norm(dx64), 1e-300)
    print(f"t={t}: n={M64.shape[0]} cond={cond:.3e} "
          f"eig=[{ev[0]:.3e},{ev[-1]:.3e}] rel_err={rel:.3e}")

    assert ev[0] > 0, "damped system must be PD"
    # the 5%-ATE gate needs the step direction, not the last bits: 1e-4
    # relative error on dx is ~1000x below the GN step-to-step noise
    assert rel < 1e-4, (rel, cond)
