"""Stereo and RGB-D pipeline mechanical tests (tiny frames, random weights)."""

import numpy as np
import pytest

from droid_slam_tpu.config import DroidConfig
from droid_slam_tpu.slam import Droid

H, W = 64, 96


def stream(n=10, stereo=False, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 255, size=(H, W, 3)).astype(np.uint8)
    out = []
    for t in range(n):
        left = np.roll(base, 3 * t, axis=1)
        if stereo:
            img = np.stack([left, np.roll(left, 2, axis=1)])
        else:
            img = left
        out.append((float(t), img,
                    np.array([40.0, 40.0, W / 2, H / 2], np.float32)))
    return out


def test_stereo_pipeline_runs():
    cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=5, stereo=True,
                      filter_thresh=-1.0, keyframe_thresh=-1.0,
                      frontend_window=10, frontend_thresh=1e9)
    droid = Droid(cfg)
    frames = stream(n=8, stereo=True)
    for t, img, intr in frames:
        droid.track(t, img, intrinsics=intr)
    assert droid.frontend.is_initialized
    # stereo edges (i, i) must exist in the graph
    ii, jj = droid.frontend.graph.ii, droid.frontend.graph.jj
    assert np.any(ii == jj)
    traj = droid.terminate(backend_steps=())
    assert np.isfinite(traj).all()


def test_rgbd_pipeline_runs():
    cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=5, depth=True,
                      filter_thresh=-1.0, keyframe_thresh=-1.0,
                      frontend_window=10, frontend_thresh=1e9)
    droid = Droid(cfg)
    rng = np.random.default_rng(1)
    depth = 2.0 + rng.uniform(size=(H, W)).astype(np.float32)
    for t, img, intr in stream(n=8):
        droid.track(t, img, depth=depth, intrinsics=intr)
    assert droid.frontend.is_initialized
    # sensor disparities must be registered
    sens = np.asarray(droid.video.buf.disps_sens[:droid.video.counter])
    assert (sens > 0).mean() > 0.9
    traj = droid.terminate(backend_steps=(1,))
    assert np.isfinite(traj).all()
