"""Data-layer tests: TUM loading/association, augmentation geometry,
covisibility graphs."""

import os

import numpy as np
import pytest

from droid_slam_tpu.data import rgbd_utils
from droid_slam_tpu.data.augmentation import RGBDAugmentor
from droid_slam_tpu.data.graph_utils import (build_frame_graph,
                                             graph_to_edge_list,
                                             neighbourhood_graph)
from droid_slam_tpu.lie import se3
import jax.numpy as jnp


def test_associate_frames():
    t_img = np.array([0.0, 0.1, 0.2, 0.31])
    t_dep = np.array([0.01, 0.11, 0.19])
    t_pose = np.array([0.0, 0.1, 0.2, 0.3])
    assoc = rgbd_utils.associate_frames(t_img, t_dep, t_pose, max_dt=0.05)
    assert assoc[0] == (0, 0, 0)
    # frame 3 (t=0.31) has no depth within 0.05 -> dropped
    assert len(assoc) == 3


def test_loadtum(tmp_path):
    d = tmp_path
    (d / "rgb").mkdir(); (d / "depth").mkdir()
    with open(d / "rgb.txt", "w") as f, open(d / "depth.txt", "w") as g, \
            open(d / "groundtruth.txt", "w") as h:
        h.write("# header\n")
        for i in range(10):
            t = i * 0.1
            f.write(f"{t} rgb/{i}.png\n")
            g.write(f"{t} depth/{i}.png\n")
            h.write(f"{t} {i} 0 0 0 0 0 1\n")
    images, depths, poses, intr, tstamps = rgbd_utils.loadtum(str(d))
    assert len(images) == 2  # every 5th associated frame
    assert poses[0][0] == 0.0 and poses[1][0] == 5.0


def test_all_pairs_distance_matrix(rng):
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (4, 1)).astype(np.float32)
    poses[1, 0] = 1.0
    d = rgbd_utils.all_pairs_distance_matrix(poses, beta=2.0)
    assert d[0, 0] < 1e-6
    np.testing.assert_allclose(d[0, 1], 2.0, atol=1e-5)
    np.testing.assert_allclose(d, d.T, atol=1e-5)


def test_augmentor_shapes(rng):
    aug = RGBDAugmentor(crop_size=(48, 64), rng=rng)
    images = rng.uniform(0, 255, size=(3, 60, 80, 3)).astype(np.float32)
    depths = (1 + rng.uniform(size=(3, 60, 80))).astype(np.float32)
    poses = np.tile([0, 0, 0, 0, 0, 0, 1.0], (3, 1)).astype(np.float32)
    intr = np.tile([50.0, 50.0, 40.0, 30.0], (3, 1)).astype(np.float32)
    out_img, out_poses, out_dep, out_intr = aug(images, poses, depths, intr)
    assert out_img.shape == (3, 48, 64, 3)
    assert out_dep.shape == (3, 48, 64)
    assert out_intr.shape == (3, 4)
    # principal point must stay consistent with the crop
    assert np.all(out_intr[:, 2] < 64) and np.all(out_intr[:, 3] < 48)


def test_neighbourhood_graph():
    ii, jj = neighbourhood_graph(5, 2)
    assert np.all(np.abs(ii - jj) <= 2) and np.all(ii != jj)


def test_build_frame_graph(rng):
    n, H, W = 5, 64, 64
    xi = np.zeros((n, 6), np.float32)
    xi[:, 0] = 0.1 * np.arange(n)
    poses_w2c = np.asarray(se3.exp(jnp.asarray(xi)))
    poses_c2w = np.asarray(se3.inv(jnp.asarray(poses_w2c)))
    disps = (0.8 + 0.2 * rng.uniform(size=(n, H, W))).astype(np.float32)
    intr = np.tile([64.0, 64.0, 32.0, 32.0], (n, 1)).astype(np.float32)
    graph = build_frame_graph(poses_c2w, disps, intr, num=12)
    ii, jj, kk = graph_to_edge_list(graph)
    assert len(ii) >= 12
    assert np.all(ii != jj)
