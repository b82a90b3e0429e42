"""End-to-end mechanical test of the SLAM pipeline on synthetic frames.

No pretrained weights ship with the reference checkout, so this validates the
*machinery* (motion filter -> frontend init/update -> keyframe removal ->
backend global BA -> trajectory filler) with random network weights on tiny
frames: every stage must run, keep state consistent, and produce finite
outputs of the right shapes.
"""

import numpy as np
import pytest

from droid_slam_tpu.config import DroidConfig
from droid_slam_tpu.slam import Droid

H, W = 64, 96


def make_stream(n=14, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
    frames = []
    for t in range(n):
        img = np.roll(base, shift=3 * t, axis=1)  # horizontal pan
        frames.append((float(t), img, np.array([40.0, 40.0, W / 2, H / 2],
                                               np.float32)))
    return frames


@pytest.fixture(scope="module")
def trajectory():
    cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=5,
                      filter_thresh=-1.0,  # admit every frame (random net)
                      keyframe_thresh=-1.0,  # never remove keyframes
                      frontend_window=10, frontend_thresh=1e9)
    droid = Droid(cfg)
    frames = make_stream()
    for t, img, intr in frames:
        droid.track(t, img, intrinsics=intr)
    n_kf = droid.video.counter
    traj = droid.terminate(iter(frames), backend_steps=(1,))
    return droid, frames, n_kf, traj


def test_keyframes_admitted(trajectory):
    droid, frames, n_kf, traj = trajectory
    assert n_kf >= 5  # warmup reached, frontend initialized


def test_trajectory_shape_and_finite(trajectory):
    droid, frames, n_kf, traj = trajectory
    assert traj.shape == (len(frames), 7)
    assert np.isfinite(traj).all()
    # quaternions normalized
    qn = np.linalg.norm(traj[:, 3:], axis=-1)
    np.testing.assert_allclose(qn, 1.0, atol=1e-4)


def test_video_state_finite(trajectory):
    droid, frames, n_kf, traj = trajectory
    t = droid.video.counter
    assert np.isfinite(np.asarray(droid.video.buf.poses[:t])).all()
    disps = np.asarray(droid.video.buf.disps[:t])
    assert np.isfinite(disps).all()
    assert (disps >= 0.001).all()


def test_keyframe_removal_machinery():
    """Force the keyframe-removal path (distance below threshold)."""
    cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=5,
                      filter_thresh=-1.0,
                      keyframe_thresh=1e9,  # always remove
                      frontend_window=10, frontend_thresh=1e9)
    droid = Droid(cfg)
    for t, img, intr in make_stream(10):
        droid.track(t, img, intrinsics=intr)
    # every post-warmup frame is admitted then removed -> counter hovers
    assert droid.video.counter <= 8
    assert droid.frontend.is_initialized


@pytest.mark.slow
def test_upsample_through_fused_paths():
    """--upsample runs must populate disps_up via the fused frontend update
    AND the fused lowmem backend (factor_graph.py:267-330 +
    depth_video.py:155-159 behavior)."""
    cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=5,
                      filter_thresh=-1.0, keyframe_thresh=-1.0,
                      frontend_window=10, frontend_thresh=1e9,
                      upsample=True)
    droid = Droid(cfg)
    frames = make_stream(10)
    for t, img, intr in frames:
        droid.track(t, img, intrinsics=intr)
    traj = droid.terminate(iter(frames), backend_steps=(1,))
    t = droid.video.counter
    dup = np.asarray(droid.video.buf.disps_up[:t])
    assert dup.shape[1:] == (H, W)
    assert np.isfinite(dup).all()
    # upsampled disparities written (nonzero) for the keyframes
    assert (np.abs(dup).reshape(t, -1).max(axis=1) > 0).all()
    assert np.isfinite(traj).all()
