"""End-to-end demo.py CLI smoke test on synthetic images (the reference's
demo-on-sfm_bench smoke test, SURVEY.md §4, without shipped data)."""

import os
import subprocess
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.mark.slow
def test_demo_cli(tmp_path):
    imgdir = tmp_path / "rgb"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(120, 160, 3)).astype(np.uint8)
    for t in range(12):
        cv2.imwrite(str(imgdir / f"{t:04d}.png"), np.roll(base, 4 * t, 1))

    calib = tmp_path / "calib.txt"
    calib.write_text("120.0 120.0 80.0 60.0\n")
    traj_path = tmp_path / "traj.txt"
    shot_path = tmp_path / "recon.png"

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               JAX_COMPILATION_CACHE_DIR=os.path.expanduser(
                   "~/.cache/jax_tests"))
    out = subprocess.run(
        [sys.executable, "demo.py", "--imagedir", str(imgdir),
         "--calib", str(calib), "--warmup", "5",
         "--filter_thresh", "-1", "--keyframe_thresh", "-1",
         "--buffer", "32", "--backend_steps",
         "--trajectory_path", str(traj_path),
         "--screenshot", str(shot_path)],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env, capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, out.stderr[-2000:]
    traj = np.loadtxt(traj_path)
    assert traj.shape[1] == 7
    assert np.isfinite(traj).all()
    # the headless reconstruction render (eval/viewer.py rasterizer)
    shot = cv2.imread(str(shot_path))
    assert shot is not None and shot.shape == (480, 640, 3), out.stderr[-500:]
