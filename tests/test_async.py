"""DroidAsync mechanical test: concurrent frontend/backend with fragment
alignment (tiny frames, random weights)."""

import numpy as np
import pytest

from droid_slam_tpu.config import DroidConfig
from droid_slam_tpu.slam.async_droid import DroidAsync

H, W = 64, 96


@pytest.mark.slow
def test_async_pipeline_runs():
    import jax

    cfg = DroidConfig(buffer=64, image_size=(H, W), warmup=5,
                      filter_thresh=-1.0, keyframe_thresh=-1.0,
                      frontend_window=10, frontend_thresh=1e9)
    droid = DroidAsync(cfg, sleep_time=0.5, backend_iters=1)
    # under the virtual 8-device conftest mesh the frontend/backend videos
    # MUST land on different devices, so the align/scale/copy protocol
    # below runs the real cross-device path (droid_async.py:142-159)
    assert len(jax.devices()) > 1
    assert droid.video.device != droid.video2.device
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, size=(H, W, 3)).astype(np.uint8)
    frames = [(float(t), np.roll(base, 3 * t, 1),
               np.array([40.0, 40.0, W / 2, H / 2], np.float32))
              for t in range(40)]
    for t, img, intr in frames:
        droid.track(t, img, intrinsics=intr)
    traj = droid.terminate(iter(frames))
    assert traj.shape == (len(frames), 7)
    assert np.isfinite(traj).all()
