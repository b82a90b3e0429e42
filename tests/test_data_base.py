"""Tests for the functional covisibility-dataset core (data/base.py) and the
results-log summarizer."""

import importlib.util
import os

import numpy as np

from droid_slam_tpu.data.base import (CovisIndex, anchor_frames,
                                      covisibility_walk,
                                      normalize_clip_scale)


def _chain_index(n, flow=20.0):
    """Covisibility where frame i sees i-1 and i+1."""
    dense = np.full((n, n), np.inf, np.float32)
    for i in range(n):
        for j in (i - 1, i + 1):
            if 0 <= j < n:
                dense[i, j] = flow
    return CovisIndex.from_dense(dense, max_flow=256.0)


def test_covis_index_from_dense():
    idx = _chain_index(5)
    assert idx.num_frames == 5
    nbrs, flow = idx.neighbours(2)
    assert sorted(nbrs.tolist()) == [1, 3]
    assert np.all(flow == 20.0)
    assert idx.degree(0) == 1


def test_covisibility_walk_prefers_forward():
    idx = _chain_index(6)
    rng = np.random.default_rng(0)
    clip = covisibility_walk(idx, 0, 4, fmin=8.0, fmax=75.0, rng=rng)
    assert clip == [0, 1, 2, 3]  # only forward neighbours qualify


def test_covisibility_walk_repeats_when_stuck():
    # flow outside (fmin, fmax) -> no candidates -> repeat current frame
    idx = _chain_index(4, flow=100.0)
    rng = np.random.default_rng(0)
    clip = covisibility_walk(idx, 1, 3, fmin=8.0, fmax=75.0, rng=rng)
    assert clip == [1, 1, 1]


def test_anchor_frames_degree_filter():
    idx = _chain_index(5)
    # interior frames have degree 2; with n_frames=1 they qualify
    assert anchor_frames(idx, 1).tolist() == [1, 2, 3]


def test_normalize_clip_scale():
    poses = np.zeros((3, 7), np.float32)
    poses[:, 0] = 4.0
    poses[:, 6] = 1.0
    disps = np.full((3, 8, 8), 2.0, np.float32)
    p2, d2 = normalize_clip_scale(poses, disps)
    np.testing.assert_allclose(d2, 1.0)
    np.testing.assert_allclose(p2[:, 0], 8.0)


def test_parse_results_summary(tmp_path, capsys):
    spec = importlib.util.spec_from_file_location(
        "parse_results",
        os.path.join(os.path.dirname(__file__), "..", "evaluation_scripts",
                     "parse_results.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    log = tmp_path / "results.log"
    log.write_text("seq a\nATE RMSE: 0.010\nnoise\n   rmse 0.030\n"
                   "rmse: 0.500\n")
    mod.main([str(log)])
    out = capsys.readouterr().out
    # 1cm, 3cm, 50cm -> auc2 = (2-1)+0+0 = 1 ; auc8 = 7+5+0 = 12
    assert "rmse auc 2cm 1.0" in out
    assert "rmse auc 8cm 12.0" in out
    assert "Average: 0.18" in out
