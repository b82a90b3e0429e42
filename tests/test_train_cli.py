"""train.py end-to-end on a miniature on-disk TartanAir-format dataset.

Round 1 left the real CLI path `--datasets tartan --datapath ...` untested
(no data); the fixture writer (data/fixtures.py::write_tartanair_fixture)
closes that: the full chain — directory scan, pose NED remap + DEPTH_SCALE,
covisibility index build + cache, covisibility-walk sampling, augmentation,
collate, jitted shard_map train step, checkpointing — runs for real. The
250k-step config is then one dataset drop away from working.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_tartanair_fixture_roundtrip(tmp_path):
    """Fast: fixture -> TartanAir reader gives consistent poses/disps."""
    pytest.importorskip("cv2")
    from droid_slam_tpu.data.fixtures import write_tartanair_fixture
    from droid_slam_tpu.data.synthetic import (poses_c2w_from_mats,
                                               random_trajectory)
    from droid_slam_tpu.data.tartan import TartanAir

    write_tartanair_fixture(str(tmp_path), n_scenes=2, n_frames=8,
                            image_size=(120, 160))
    db = TartanAir(datapath=str(tmp_path), n_frames=5, fmin=4.0, fmax=96.0,
                   crop_size=(96, 128),
                   cache_dir=str(tmp_path / ".index_cache"))
    assert len(db.scenes) == 2 and len(db) > 0

    # reader poses must equal the original XYZ c2w trajectory (the NED
    # remap + DEPTH_SCALE write/read must cancel exactly)
    rng = np.random.default_rng(6 * 1009 + 0)
    rng.integers(1, 2 ** 20)
    Rs, ts = random_trajectory(8, rng)
    expect = poses_c2w_from_mats(Rs, ts)
    scene = db.scenes[sorted(db.scenes)[0]]
    np.testing.assert_allclose(scene.poses, expect, atol=1e-6)

    images, poses, disps, intr = db[0]
    assert images.shape == (5, 96, 128, 3)
    assert disps.shape == (5, 96, 128)
    assert np.isfinite(disps).all() and (disps > 0).all()
    assert poses.shape == (5, 7) and intr.shape == (5, 4)


@pytest.mark.slow
def test_train_cli_on_tartanair_fixture(tmp_path):
    pytest.importorskip("cv2")
    from droid_slam_tpu.data.fixtures import write_tartanair_fixture

    data = tmp_path / "TartanAir"
    write_tartanair_fixture(str(data), n_scenes=2, n_frames=10,
                            image_size=(160, 224))

    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu",
               PYTHONPATH=REPO,
               JAX_COMPILATION_CACHE_DIR=os.path.expanduser(
                   "~/.cache/jax_tests"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--name", "fixture", "--datasets", "tartan",
         "--datapath", str(data), "--batch", "1", "--iters", "2",
         "--steps", "2", "--n_frames", "5", "--image_size", "96", "128",
         "--fmin", "4.0", "--ckpt_every", "2", "--state_every", "2",
         "--devices", "1"],  # conftest exports an 8-device virtual mesh
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=2400)
    assert out.returncode == 0, (out.stdout[-2000:], out.stderr[-2000:])
    assert "step      2" in out.stdout, out.stdout[-2000:]
    # both checkpoint flavors written, loadable, finite
    from droid_slam_tpu.models import weights as weights_io
    params = weights_io.load(str(tmp_path / "checkpoints" /
                                 "fixture_final.npz"))
    assert all(np.isfinite(np.asarray(v)).all() for v in params.values())
    _, _, step = weights_io.load_train_state(
        str(tmp_path / "checkpoints" / "fixture_state_final.pkl"))
    assert step == 2
