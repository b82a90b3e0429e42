"""Training-BA tests: Schur elimination vs full KKT solve, GN convergence."""

import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_tpu.ba import dense, edge_terms
from droid_slam_tpu.geom import projective as pops
from droid_slam_tpu.lie import se3


def synthetic_problem(rng, n=4, h=8, w=8, noise=0.03):
    """Ground-truth scene + perturbed initialization + GT targets."""
    xi = np.zeros((n, 6), np.float32)
    xi[:, 0] = 0.2 * np.arange(n)  # translate along x
    xi[:, 4] = 0.02 * np.arange(n)
    poses_gt = se3.exp(jnp.asarray(xi))
    disps_gt = jnp.asarray((0.7 + 0.3 * rng.uniform(size=(n, h, w))).astype(np.float32))
    intr = jnp.asarray(np.tile(np.array([32.0, 32.0, w / 2, h / 2], np.float32),
                               (n, 1)))
    ii, jj = [], []
    for a in range(n):
        for b in range(n):
            if abs(a - b) == 1:
                ii.append(a); jj.append(b)
    ii = jnp.asarray(ii); jj = jnp.asarray(jj)

    target, valid, _ = pops.projective_transform(poses_gt, disps_gt, intr, ii, jj)
    target = target.reshape(len(ii), h * w, 2).transpose(0, 2, 1)  # [E,2,HW]

    pert = rng.normal(size=(n, 6)).astype(np.float32) * noise
    pert[:2] = 0  # keep fixed frames at GT
    poses0 = se3.retr(poses_gt, jnp.asarray(pert))
    disps0 = disps_gt * (1.0 + 0.1 * jnp.asarray(
        rng.normal(size=(n, h, w)).astype(np.float32)))
    return poses_gt, disps_gt, poses0, disps0, intr, ii, jj, target


def test_schur_matches_full_kkt(rng):
    """The Schur-eliminated GN step must equal the direct solve of the full
    (pose+depth) damped normal equations."""
    n, h, w = 3, 4, 4
    hw = h * w
    poses_gt, disps_gt, poses0, disps0, intr, ii, jj, target = \
        synthetic_problem(rng, n=n, h=h, w=w)
    E = ii.shape[0]
    weight = jnp.ones((E, 2, hw), jnp.float32)
    eta = 0.05 * jnp.ones((n, hw), jnp.float32)
    fixedp, ep, lm = 1, 0.1, 1e-4
    P = n - fixedp

    # our implementation
    poses1, disps1 = dense.bundle_adjust(
        target[None], weight[None], eta[None], poses0[None], disps0[None],
        intr[None], ii, jj, fixedp=fixedp, ep=ep, lm=lm)

    # independent full KKT solve from the same linearization blocks
    t = edge_terms.linearize(poses0, disps0, intr, target, weight, ii, jj,
                             min_depth=0.2, zero_stereo_pose=False)
    Hii, Hij, Hji, Hjj, vi, vj = edge_terms.pose_blocks(t)
    Ei, Ej, Cz, bz = edge_terms.depth_blocks(t)

    Hfull = np.zeros((P * 6, P * 6))
    vfull = np.zeros(P * 6)
    Efull = np.zeros((P * 6, n * hw))
    for e in range(E):
        a, b = int(ii[e]) - fixedp, int(jj[e]) - fixedp
        for (r_, c_, blk) in [(a, a, Hii[e]), (a, b, Hij[e]),
                              (b, a, Hji[e]), (b, b, Hjj[e])]:
            if r_ >= 0 and c_ >= 0:
                Hfull[r_*6:(r_+1)*6, c_*6:(c_+1)*6] += np.asarray(blk)
        if a >= 0:
            vfull[a*6:(a+1)*6] += np.asarray(vi[e])
            Efull[a*6:(a+1)*6, int(ii[e])*hw:(int(ii[e])+1)*hw] += np.asarray(Ei[e])
        if b >= 0:
            vfull[b*6:(b+1)*6] += np.asarray(vj[e])
            Efull[b*6:(b+1)*6, int(ii[e])*hw:(int(ii[e])+1)*hw] += np.asarray(Ej[e])

    C = np.zeros(n * hw)
    wz = np.zeros(n * hw)
    for e in range(E):
        C[int(ii[e])*hw:(int(ii[e])+1)*hw] += np.asarray(Cz[e])
        wz[int(ii[e])*hw:(int(ii[e])+1)*hw] += np.asarray(bz[e])
    C += np.asarray(eta).reshape(-1) + 1e-7

    Hd = Hfull + (ep + lm * Hfull) * np.eye(P * 6)
    KKT = np.block([[Hd, Efull], [Efull.T, np.diag(C)]])
    rhs = np.concatenate([vfull, wz])
    sol = np.linalg.solve(KKT, rhs)
    dx = sol[:P*6].reshape(P, 6)
    dz = sol[P*6:].reshape(n, h, w)

    poses_ref = np.asarray(se3.retr(poses0[fixedp:], jnp.asarray(dx, jnp.float32)))
    disps_ref = np.clip(np.asarray(disps0) + dz, 0.0, None)

    np.testing.assert_allclose(np.asarray(poses1[0, fixedp:]), poses_ref,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(disps1[0]), disps_ref, atol=2e-4)


def test_ba_converges_to_ground_truth(rng):
    poses_gt, disps_gt, poses0, disps0, intr, ii, jj, target = \
        synthetic_problem(rng)
    n, h, w = disps_gt.shape
    E = ii.shape[0]
    weight = jnp.ones((E, 2, h * w), jnp.float32)
    eta = 0.01 * jnp.ones((n, h * w), jnp.float32)

    poses, disps = poses0[None], disps0[None]
    def cost(p, d):
        c, _, _ = pops.projective_transform(p[0], d[0], intr, ii, jj)
        c = c.reshape(E, h * w, 2).transpose(0, 2, 1)
        return float(jnp.mean((c - target) ** 2))

    c0 = cost(poses, disps)
    for _ in range(8):
        poses, disps = dense.bundle_adjust(
            target[None], weight[None], eta[None], poses, disps, intr[None],
            ii, jj, fixedp=2)
    c1 = cost(poses, disps)
    assert c1 < 1e-4 * max(c0, 1e-12) or c1 < 1e-8

    # pose error vs ground truth (frames >= 2 were free); the step is heavily
    # damped (ep=0.1, reference default), so convergence is geometric — accept
    # the neighborhood of GT rather than machine precision
    err = np.asarray(se3.log(se3.mul(se3.inv(poses[0]), poses_gt)))
    assert np.abs(err[2:]).max() < 2e-2


def test_motion_only_converges(rng):
    poses_gt, disps_gt, poses0, _, intr, ii, jj, target = synthetic_problem(rng)
    n, h, w = disps_gt.shape
    E = ii.shape[0]
    weight = jnp.ones((E, 2, h * w), jnp.float32)
    poses = poses0[None]
    # use GT disparities: motion-only should recover GT poses
    for _ in range(8):
        poses = dense.motion_only(target[None], weight[None], poses,
                                  disps_gt[None], intr[None], ii, jj, fixedp=2)
    err = np.asarray(se3.log(se3.mul(se3.inv(poses[0]), poses_gt)))
    assert np.abs(err[2:]).max() < 5e-3


def test_padded_edges_are_inert(rng):
    """Padding edges with edge_valid=False must not change the result."""
    poses_gt, disps_gt, poses0, disps0, intr, ii, jj, target = \
        synthetic_problem(rng)
    n, h, w = disps_gt.shape
    E = ii.shape[0]
    weight = jnp.ones((E, 2, h * w), jnp.float32)
    eta = 0.01 * jnp.ones((n, h * w), jnp.float32)

    p1, d1 = dense.bundle_adjust(target[None], weight[None], eta[None],
                                 poses0[None], disps0[None], intr[None],
                                 ii, jj, fixedp=2)
    # pad with garbage edges, masked out
    pad = 5
    ii_p = jnp.concatenate([ii, jnp.zeros(pad, ii.dtype)])
    jj_p = jnp.concatenate([jj, jnp.ones(pad, jj.dtype)])
    tgt_p = jnp.concatenate([target, 1e3 * jnp.ones((pad, 2, h * w))], axis=0)
    wgt_p = jnp.concatenate([weight, jnp.ones((pad, 2, h * w))], axis=0)
    ev = jnp.concatenate([jnp.ones(E, bool), jnp.zeros(pad, bool)])
    p2, d2 = dense.bundle_adjust(tgt_p[None], wgt_p[None], eta[None],
                                 poses0[None], disps0[None], intr[None],
                                 ii_p, jj_p, edge_valid=ev, fixedp=2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-6)


def test_solve_psd_grad_finite_on_indefinite():
    """An indefinite system must yield a ZERO step with FINITE gradients:
    XLA's potrf emits NaN primals for indefinite input, and a NaN primal
    poisons cholesky's VJP even when the forward value is masked away
    (0 * NaN) — this silently NaN'd the whole training step the first time
    one GN system went indefinite (ba/solver.py probe/refactorize guard)."""
    import jax
    import jax.numpy as jnp
    from droid_slam_tpu.ba.solver import solve_psd

    H_bad = -jnp.eye(4, dtype=jnp.float32)          # indefinite
    H_ok = 2.0 * jnp.eye(4, dtype=jnp.float32)      # SPD
    b = jnp.ones(4, jnp.float32)

    x_bad = solve_psd(H_bad, b)
    assert np.allclose(np.asarray(x_bad), 0.0)      # reference zero-step

    for H in (H_bad, H_ok):
        gH = jax.grad(lambda M: jnp.sum(solve_psd(M, b) ** 2))(H)
        gb = jax.grad(lambda v: jnp.sum(solve_psd(H, v) ** 2))(b)
        assert np.isfinite(np.asarray(gH)).all()
        assert np.isfinite(np.asarray(gb)).all()

    # SPD path still solves correctly
    np.testing.assert_allclose(np.asarray(solve_psd(H_ok, b)), 0.5, atol=1e-6)
