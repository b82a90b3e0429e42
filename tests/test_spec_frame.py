"""Speculative frame dispatch (slam/droid.py::_track_fused_spec).

The speculative pipeline dispatches each steady-state frame BEFORE resolving
the previous frame's admission/keep readback, with on-device gates masking a
mis-speculated frame's writes and host-side snapshot/unwind. These tests run
the fused path on CPU (DROID_FUSED_FRAME=1) and compare speculative vs
strict sequencing across the three resolution outcomes:
  * commit (admit + keep) — the bench steady state;
  * admission rejection — unwind without redispatch;
  * keyframe removal — unwind + strict re-run (the rare correction path).

Equivalence comparisons use frontend_thresh=0 so the proximity proposal is
distance-independent (only the mandatory radius edges): the ONE intended
deviation of the speculative mode is that proposal distances come from a
probe dispatched one frame earlier (probe_lead=2, one update staler), which
with random weights amplifies chaotically. With that deviation switched off
the two modes must agree to float tolerance.
"""

import os

import numpy as np
import pytest

from droid_slam_tpu.config import DroidConfig

H, W = 64, 96


def make_stream(n=16, seed=0):
    rng = np.random.default_rng(seed)
    base = (rng.uniform(0, 255, size=(H, W, 3))).astype(np.uint8)
    return [(float(t), np.roll(base, shift=3 * t, axis=1),
             np.array([40.0, 40.0, W / 2, H / 2], np.float32))
            for t in range(n)]


def run_pipeline(spec, filter_thresh=-1.0, keyframe_thresh=-1.0, n=16,
                 frontend_thresh=0.0):
    os.environ["DROID_FUSED_FRAME"] = "1"
    os.environ["DROID_SPEC_FRAME"] = "1" if spec else "0"
    try:
        from droid_slam_tpu.slam import Droid
        cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=5,
                          filter_thresh=filter_thresh,
                          keyframe_thresh=keyframe_thresh,
                          frontend_window=10,
                          frontend_thresh=frontend_thresh)
        droid = Droid(cfg)
        assert droid._fused_frame
        assert droid._spec_frame == spec
        for t, img, intr in make_stream(n):
            droid.track(t, img, intrinsics=intr)
        droid.flush()
        poses = np.asarray(droid.video.buf.poses[:droid.video.counter])
        return droid, poses
    finally:
        os.environ.pop("DROID_FUSED_FRAME", None)
        os.environ.pop("DROID_SPEC_FRAME", None)


def edge_set(droid):
    return sorted((e[1], e[2]) for e in droid.frontend.graph.edges)


class TestCommitPath:
    """All frames admitted and kept: every speculation commits."""

    @pytest.fixture(scope="class")
    def both(self):
        d0, p0 = run_pipeline(spec=False)
        d1, p1 = run_pipeline(spec=True)
        return d0, p0, d1, p1

    def test_same_keyframe_count(self, both):
        d0, p0, d1, p1 = both
        assert d0.video.counter == d1.video.counter

    def test_no_misspeculation(self, both):
        _, _, d1, _ = both
        assert getattr(d1, "_spec_mis", 0) == 0

    def test_same_graph_and_trajectory(self, both):
        d0, p0, d1, p1 = both
        assert edge_set(d0) == edge_set(d1)
        assert np.isfinite(p1).all()
        np.testing.assert_allclose(p0, p1, atol=1e-4)

    def test_live_proposals_consistent(self):
        """With live (distance-dependent) proposals the graphs may differ —
        the documented probe-staleness deviation — but the pipeline must
        stay consistent and the distance ring must serve (almost) every
        frame without an eager fallback."""
        d0, p0 = run_pipeline(spec=False, frontend_thresh=1e9)
        d1, p1 = run_pipeline(spec=True, frontend_thresh=1e9)
        assert d0.video.counter == d1.video.counter
        assert np.isfinite(p1).all()
        assert getattr(d1, "_spec_mis", 0) == 0
        assert getattr(d1, "_spec_dist_miss", 0) <= 1


class TestRejectPath:
    """A post-warmup admission threshold forces mis-speculated admissions:
    the spec path must unwind and stay consistent with the strict path."""

    _thr_cache = None

    def _threshold(self):
        # pick the median admission delta observed on the strict all-admit
        # run, so roughly half the post-warmup frames get rejected
        if TestRejectPath._thr_cache is None:
            d0, _ = run_pipeline(spec=False)
            deltas = getattr(d0, "_delta_log", [])
            assert deltas, "no admission deltas logged"
            TestRejectPath._thr_cache = float(np.median(deltas))
        return TestRejectPath._thr_cache

    def test_reject_consistency(self):
        thr = self._threshold()
        d0, p0 = run_pipeline(spec=False, filter_thresh=thr)
        d1, p1 = run_pipeline(spec=True, filter_thresh=thr)
        assert d1.video.counter < 16  # some frames rejected
        assert getattr(d1, "_spec_mis", 0) >= 1  # unwind path exercised
        assert d0.video.counter == d1.video.counter
        assert d0.filterx.count == d1.filterx.count
        assert edge_set(d0) == edge_set(d1)
        np.testing.assert_allclose(p0, p1, atol=1e-4)


class TestKeepRemovalPath:
    """keyframe_thresh high enough that updates trigger keyframe removal:
    the spec path must fall back to the strict re-run."""

    def test_removal_consistency(self):
        d0, p0 = run_pipeline(spec=False, keyframe_thresh=1e9, n=10)
        d1, p1 = run_pipeline(spec=True, keyframe_thresh=1e9, n=10)
        assert d1.video.counter <= 8
        assert getattr(d1, "_spec_mis", 0) >= 1
        assert d0.video.counter == d1.video.counter
        assert edge_set(d0) == edge_set(d1)
        np.testing.assert_allclose(p0[:d0.video.counter],
                                   p1[:d1.video.counter], atol=1e-4)
