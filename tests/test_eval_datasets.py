"""Integration tests for the real-dataset evaluation CLIs.

No network egress means no real EuRoC/TUM/ETH3D imagery — so these tests
render procedural scenes INTO the real on-disk dataset layouts
(droid_slam_tpu/data/fixtures.py) and run the actual evaluation scripts
end-to-end as subprocesses: stream parsing + rectification/undistortion,
stride-2 track / stride-1 fill interplay, GT file parsing, timestamp
association, and the final ATE computation all execute for real
(mirroring /root/reference/evaluation_scripts/test_euroc.py:27-154 etc.).

Accuracy is NOT asserted (random weights, mismatched distortion models) —
execution, shape and finiteness are.
"""

import glob
import os
import re
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_eval(script, args, timeout=2400):
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.expanduser(
                   "~/.cache/jax_tests"))
    out = subprocess.run(
        [sys.executable, os.path.join("evaluation_scripts", script)] + args,
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    m = re.search(r"ATE RMSE: ([0-9.eE+-]+|nan) m", out.stdout)
    assert m is not None, out.stdout[-2000:]
    ate = float(m.group(1))
    assert np.isfinite(ate)
    return ate


@pytest.mark.slow
def test_euroc_cli_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    from droid_slam_tpu.data.fixtures import write_euroc_fixture

    gt = write_euroc_fixture(str(tmp_path), n_frames=20)
    _run_eval("test_euroc.py",
              ["--datapath", str(tmp_path), "--gt", gt,
               "--image_size", "64", "96", "--buffer", "32",
               "--warmup", "5", "--filter_thresh", "-1",
               "--keyframe_thresh", "-1", "--backend_steps", "1"])


@pytest.mark.slow
def test_tum_cli_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    from droid_slam_tpu.data.fixtures import write_tum_fixture

    write_tum_fixture(str(tmp_path), n_frames=20)
    _run_eval("test_tum.py",
              ["--datapath", str(tmp_path),
               "--image_size", "64", "96", "--buffer", "32",
               "--warmup", "5", "--filter_thresh", "-1",
               "--keyframe_thresh", "-1", "--backend_steps", "1"])


@pytest.mark.slow
def test_eth3d_cli_end_to_end(tmp_path):
    pytest.importorskip("cv2")
    from droid_slam_tpu.data.fixtures import write_eth3d_fixture

    write_eth3d_fixture(str(tmp_path), n_frames=16, image_size=(240, 320))
    # --image_size here is the sqrt-area resize target: 96x128 of a 240x320
    # source -> exact 96x128 frames (multiple of 8, required by the nets)
    _run_eval("test_eth3d.py",
              ["--datapath", str(tmp_path),
               "--image_size", "96", "128", "--buffer", "32",
               "--warmup", "5", "--filter_thresh", "-1",
               "--keyframe_thresh", "-1", "--backend_steps", "1"])


def test_vendored_euroc_groundtruth_parses():
    """Round-trip the vendored data/euroc_groundtruth/*.txt through the
    EXACT parse test_euroc.py uses (np.loadtxt delimiter=' ' skiprows=1) —
    the fragile spot flagged in round 1's review."""
    files = sorted(glob.glob(os.path.join(REPO, "data",
                                          "euroc_groundtruth", "*.txt")))
    assert len(files) == 11
    for path in files:
        gt = np.loadtxt(path, delimiter=" ", skiprows=1)
        assert gt.ndim == 2 and gt.shape[1] == 8, path
        assert np.isfinite(gt).all(), path
        assert gt[0, 0] > 1e14, path  # ns timestamps -> /1e9 branch
        # quaternions are stored [w x y z] and must be unit-norm
        qn = np.linalg.norm(gt[:, 4:8], axis=1)
        assert np.allclose(qn, 1.0, atol=1e-3), path


def test_fixture_streams_parse(tmp_path):
    """Fast check (no SLAM run): the fixture layouts round-trip through the
    stream readers with consistent shapes/timestamps."""
    pytest.importorskip("cv2")
    from droid_slam_tpu.data import fixtures, stream

    eu = tmp_path / "euroc"
    fixtures.write_euroc_fixture(str(eu), n_frames=4, image_size=(120, 188))
    frames = stream.euroc_stream(str(eu), image_size=(64, 96))
    assert len(frames) == 4
    t, img, intr = frames[0]
    assert img.shape == (64, 96, 3) and intr.shape == (4,)
    ts = stream.euroc_timestamps(str(eu))
    assert len(ts) == 4 and ts[0] > 1e14

    tum = tmp_path / "tum"
    fixtures.write_tum_fixture(str(tum), n_frames=4, image_size=(120, 160))
    frames = stream.tum_stream(str(tum), stride=1, image_size=(64, 96))
    assert len(frames) == 4 and frames[0][1].shape == (64, 96, 3)
    assert len(stream.tum_timestamps(str(tum), stride=1)) == 4

    eth = tmp_path / "eth3d"
    fixtures.write_eth3d_fixture(str(eth), n_frames=4, image_size=(120, 160))
    frames = list(stream.eth3d_stream(str(eth), use_depth=True,
                                      target_area=48 * 64))
    t, img, depth, intr = frames[0]
    assert img.shape[2] == 3 and depth.shape == img.shape[:2]
    assert img.shape[0] % 8 == 0 and img.shape[1] % 8 == 0
    # exact render depth survives the uint16 round-trip to ~1/5000 m
    assert 0.05 < float(np.median(depth)) < 20.0
    assert len(stream.eth3d_timestamps(str(eth))) == 4
