"""Cross-checks of the eval metric stack against the reference's third-party
evaluators (/root/reference/thirdparty/tartanair_tools/evaluation — pure
numpy, runs here). Guards against sign/convention errors that synthetic-only
tests would miss."""

import os
import sys

import numpy as np
import pytest

TOOLS = "/root/reference/thirdparty/tartanair_tools"
HAS_TOOLS = os.path.isdir(os.path.join(TOOLS, "evaluation"))

pytestmark = pytest.mark.skipif(not HAS_TOOLS,
                                reason="reference tartanair_tools not found")


@pytest.fixture(scope="module")
def ref_eval():
    sys.path.insert(0, TOOLS)
    import evaluation.evaluate_ate_scale as ate_mod
    import evaluation.evaluate_rpe as rpe_mod
    import evaluation.evaluate_kitti as kitti_mod
    yield ate_mod, rpe_mod, kitti_mod
    sys.path.remove(TOOLS)


def _synthetic_traj(n, rng, step=0.5, rot_step=0.05):
    """Smooth random trajectory as [n,7] ([t,q])."""
    from scipy.spatial.transform import Rotation

    t = np.cumsum(rng.normal(0, step, size=(n, 3)), axis=0)
    rotvecs = np.cumsum(rng.normal(0, rot_step, size=(n, 3)), axis=0)
    q = Rotation.from_rotvec(rotvecs).as_quat()
    return np.concatenate([t, q], axis=1)


def _similarity_warp(traj, rng, s=2.0, noise=0.0):
    """Apply a global similarity (scale, rotation, translation) + noise to
    trajectory positions."""
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec([0.3, -0.2, 0.5]).as_matrix()
    out = traj.copy()
    out[:, :3] = s * traj[:, :3] @ R.T + np.array([1.0, -2.0, 3.0])
    out[:, :3] += rng.normal(0, noise, size=out[:, :3].shape)
    return out


class TestATE:
    def test_noise_free_exact_zero(self, ref_eval, rng):
        ate_mod, _, _ = ref_eval
        gt = _synthetic_traj(50, rng)
        est = _similarity_warp(gt, rng, s=2.0, noise=0.0)

        # reference: align(model=gt, data=est) errors in gt scale
        _, _, trans_err, s_ref = ate_mod.align(
            np.matrix(gt[:, :3].T), np.matrix(est[:, :3].T), calc_scale=True)
        rmse_ref = float(np.sqrt(np.mean(np.square(trans_err))))

        from droid_slam_tpu.eval.ate import evaluate_ate
        res = evaluate_ate(est, gt, scale=True)

        assert rmse_ref < 1e-9 and res["ate_rmse"] < 1e-9
        # both scales map est back to gt's metric scale
        np.testing.assert_allclose(res["scale"], s_ref, rtol=1e-6)
        np.testing.assert_allclose(res["scale"], 0.5, rtol=1e-6)

    def test_noisy_close(self, ref_eval, rng):
        ate_mod, _, _ = ref_eval
        gt = _synthetic_traj(120, rng)
        est = _similarity_warp(gt, rng, s=1.7, noise=0.05)

        _, _, trans_err, s_ref = ate_mod.align(
            np.matrix(gt[:, :3].T), np.matrix(est[:, :3].T), calc_scale=True)
        rmse_ref = float(np.sqrt(np.mean(np.square(trans_err))))

        from droid_slam_tpu.eval.ate import evaluate_ate
        res = evaluate_ate(est, gt, scale=True)

        # ours solves the least-squares-optimal scale; the reference's
        # norms/dots scale is only optimal at zero noise — allow 2%
        assert res["ate_rmse"] <= rmse_ref * (1 + 1e-9)
        np.testing.assert_allclose(res["ate_rmse"], rmse_ref, rtol=0.02)
        np.testing.assert_allclose(res["scale"], s_ref, rtol=0.02)


class TestRPE:
    def test_per_pair_errors_match(self, ref_eval, rng):
        _, rpe_mod, _ = ref_eval
        gt = _synthetic_traj(40, rng)
        est = _synthetic_traj(40, rng, step=0.4)

        from droid_slam_tpu.eval.ate import _pose_matrices, rpe_pairs
        gt_se = list(_pose_matrices(gt))
        est_se = list(_pose_matrices(est))
        result = np.array(rpe_mod.evaluate_trajectory(
            gt_se, est_se, param_fixed_delta=True, param_delta=1))

        t_err, r_err = rpe_pairs(est, gt, delta=1)
        np.testing.assert_allclose(t_err, result[:, 2], atol=1e-9)
        np.testing.assert_allclose(r_err, result[:, 3], atol=1e-9)


class TestKITTI:
    def test_sequence_errors_match(self, ref_eval, rng):
        _, _, kitti_mod = ref_eval
        # long trajectory so several segment lengths trigger
        gt = _synthetic_traj(400, rng, step=0.3)
        est = gt.copy()
        est[:, :3] += np.cumsum(rng.normal(0, 0.01, size=(400, 3)), axis=0)

        from droid_slam_tpu.eval.ate import _pose_matrices
        from droid_slam_tpu.eval.kitti import kitti_sequence_errors
        lens = [5, 10, 15, 20, 25, 30, 35, 40]

        ref_errs = kitti_mod.calculate_sequence_error(
            list(_pose_matrices(gt)), list(_pose_matrices(est)),
            lengths=lens)
        ours = kitti_sequence_errors(gt, est, step=1, lengths=lens)

        assert len(ours) == len(ref_errs)
        ref_arr = np.array([e[:4] for e in ref_errs], np.float64)
        our_arr = np.array([o[:4] for o in ours], np.float64)
        np.testing.assert_allclose(our_arr, ref_arr, atol=1e-9)
