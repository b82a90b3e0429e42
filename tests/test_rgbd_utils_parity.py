"""Pin data/rgbd_utils.py's covisibility flow metric against the reference
routine (/root/reference/droid_slam/data_readers/rgbd_utils.py:105-142)
executed for real on CPU torch via the lietorch shim — the same strategy
test_eval_ref_parity.py uses for the ATE evaluators."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = "/root/reference/droid_slam"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not found")


def _scene(n=5, h=16, w=24, seed=0):
    from droid_slam_tpu.data.synthetic import (poses_c2w_from_mats,
                                               random_trajectory)
    rng = np.random.default_rng(seed)
    Rs, ts = random_trajectory(n, rng, step=0.15, rot_step=0.04)
    poses_c2w = poses_c2w_from_mats(Rs, ts)
    disps = rng.uniform(0.3, 1.2, size=(n, h, w)).astype(np.float32)
    intr = np.array([0.8 * w, 0.8 * w, w / 2, h / 2], np.float32)
    return poses_c2w, disps, intr


def test_flow_distance_matrix_matches_reference():
    torch = pytest.importorskip("torch")
    import ref_shims
    ref_shims.install()
    if os.path.join(REF, "data_readers") not in sys.path:
        sys.path.insert(0, os.path.join(REF, "data_readers"))
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import rgbd_utils as ref_rgbd  # noqa: reference module
    from lietorch import SE3  # noqa: the shim

    from droid_slam_tpu.data.rgbd_utils import compute_distance_matrix_flow
    from droid_slam_tpu.lie import se3
    import jax.numpy as jnp

    poses_c2w, disps, intr = _scene()
    n = len(disps)

    ours = compute_distance_matrix_flow(
        poses_c2w, disps, np.broadcast_to(intr, (n, 4)).copy())

    # reference path: already-inverted (w2c) SE3 skips its .cuda() branch
    poses_w2c = np.asarray(se3.inv(jnp.asarray(poses_c2w)))
    ref = ref_rgbd.compute_distance_matrix_flow(
        SE3(torch.from_numpy(poses_w2c)[None].float()),
        torch.from_numpy(disps)[None].float(),
        torch.from_numpy(np.broadcast_to(intr, (n, 4)).copy())[None].float())

    assert ours.shape == ref.shape == (n, n)
    finite = np.isfinite(ref)
    assert (np.isfinite(ours) == finite).all()
    np.testing.assert_allclose(ours[finite], ref[finite],
                               rtol=2e-3, atol=2e-3)
    # the diagonal is NOT zero: ii==jj edges get the stereo-baseline
    # override (reference projective_ops.py:176-178), so self-distance is
    # the baseline-induced flow — small but positive
    assert (np.diag(ours) > 0).all()
