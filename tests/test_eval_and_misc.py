"""Eval-metric and auxiliary-module tests."""

import numpy as np
import jax.numpy as jnp

from droid_slam_tpu.eval.ate import (associate_timestamps, evaluate_ate,
                                     rpe, umeyama_alignment)
from droid_slam_tpu.eval.kitti import kitti_metrics
from droid_slam_tpu.slam.align import align_pose_fragments
from droid_slam_tpu.lie import se3
from droid_slam_tpu.train import losses


def random_traj(rng, n=60, scale=1.0):
    xi = rng.normal(size=(n, 6)).astype(np.float32) * 0.1
    poses = [np.array([0, 0, 0, 0, 0, 0, 1], np.float32)]
    for k in range(n - 1):
        poses.append(np.asarray(se3.mul(se3.exp(jnp.asarray(xi[k])),
                                        jnp.asarray(poses[-1]))))
    traj = np.stack(poses)
    traj[:, :3] *= scale
    return traj


def test_umeyama_recovers_similarity(rng):
    x = rng.normal(size=(3, 40))
    from scipy.spatial.transform import Rotation
    R_true = Rotation.random(random_state=1).as_matrix()
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5])
    y = s_true * R_true @ x + t_true[:, None]
    R, t, s = umeyama_alignment(x, y, with_scale=True)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(s, s_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_scaled_copy(rng):
    traj = random_traj(rng)
    est = traj.copy()
    est[:, :3] *= 3.7  # scale ambiguity must be absorbed
    out = evaluate_ate(est, traj, scale=True)
    assert out["ate_rmse"] < 1e-5
    np.testing.assert_allclose(out["scale"], 1 / 3.7, rtol=1e-4)


def test_ate_with_timestamps(rng):
    traj = random_traj(rng, n=30)
    t_ref = np.arange(30) * 0.1
    t_est = t_ref[::2] + 0.001
    out = evaluate_ate(traj[::2], traj, t_est=t_est, t_ref=t_ref, scale=False)
    assert out["n_matches"] == 15
    assert out["ate_rmse"] < 1e-6


def test_rpe_zero_for_identical(rng):
    traj = random_traj(rng)
    t_err, r_err = rpe(traj, traj)
    assert t_err < 1e-6 and r_err < 1e-6


def test_kitti_metrics_zero_for_identical(rng):
    traj = random_traj(rng, n=400, scale=5.0)
    t_rel, r_rel = kitti_metrics(traj, traj)
    assert t_rel < 1e-6 and r_rel < 1e-7


def test_align_pose_fragments(rng):
    """align must recover a known (dG, s) between fragments."""
    traj = jnp.asarray(random_traj(rng, n=12))
    s_true = 2.0
    dG_true = se3.exp(jnp.asarray([0.3, -0.2, 0.1, 0.05, 0.02, -0.04]))
    scaled = traj.at[:, :3].multiply(s_true)
    traj2 = se3.mul(dG_true, scaled)
    dG, s = align_pose_fragments(traj, traj2)
    np.testing.assert_allclose(float(s), s_true, rtol=1e-4)
    err = se3.log(se3.mul(se3.inv(dG[0]), dG_true))
    assert np.abs(np.asarray(err)).max() < 1e-3


def test_geodesic_loss_zero_at_gt(rng):
    traj = jnp.asarray(random_traj(rng, n=6))
    ii = jnp.asarray([0, 1, 2]); jj = jnp.asarray([1, 2, 3])
    loss, metrics = losses.geodesic_loss(traj, [traj], ii, jj,
                                         do_scale=False)
    assert float(loss) < 1e-5
    assert float(metrics["rot_error"]) < 1e-4


def test_flow_loss_zero_at_gt(rng):
    n, h, w = 4, 16, 16
    traj = jnp.asarray(random_traj(rng, n=n)) * 0.2
    traj = se3.normalize(traj)
    disps = jnp.asarray(0.5 + rng.uniform(size=(n, h, w)).astype(np.float32))
    intr = jnp.asarray(np.tile([16.0, 16.0, 8.0, 8.0], (n, 1)),
                       jnp.float32)
    loss, metrics = losses.flow_loss(traj, disps, [traj], [disps], intr)
    assert float(loss) < 1e-4
