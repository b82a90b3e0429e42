"""Edge-parallel frontend as a real tracking mode (VERDICT r3 item 4):
`DroidConfig(edge_parallel=8)` tracks a FULL sequence with the update
operator shard_map'd over the virtual 8-device CPU mesh, and the result
must match the serial pipeline end-to-end — identical keyframe decisions
and edge sets, float-tolerance trajectories (the sharded program psums the
per-frame aggregations and all-gathers target/weight for the replicated
BA, so only reduction reassociation differs).

Also measures the collective overhead on the virtual mesh so the 2-chip
projection in ROOFLINE.md has data behind it (printed, not asserted)."""

import os
import time

import numpy as np
import pytest

H, W = 64, 96
N_FRAMES = 14
CKPT = os.path.join(os.path.dirname(__file__), "..",
                    "checkpoints", "r5_006000.npz")


def _frames():
    from droid_slam_tpu.data.synthetic import synthetic_stream
    return list(synthetic_stream(n_frames=N_FRAMES, image_size=(H, W),
                                 seed=11, step=0.12, rot_step=0.04))


def _run(edge_parallel):
    os.environ["DROID_FUSED_FRAME"] = "0"
    from droid_slam_tpu.config import DroidConfig
    from droid_slam_tpu.slam import Droid

    cfg = DroidConfig(buffer=32, image_size=(H, W), warmup=6,
                      filter_thresh=1.0, keyframe_thresh=2.0,
                      frontend_window=16, frontend_thresh=16.0,
                      frontend_radius=2, frontend_nms=1,
                      motion_damping=0.0, weights=CKPT if
                      os.path.exists(CKPT) else None,
                      edge_parallel=edge_parallel)
    droid = Droid(cfg)
    tic = time.perf_counter()
    for t, img, intr in _frames():
        droid.track(float(t), img[0], intrinsics=intr)
    droid.flush()
    wall = time.perf_counter() - tic

    n = droid.video.counter
    g = droid.frontend.graph
    return dict(
        counter=n,
        tstamps=[float(x) for x in np.asarray(droid.video.buf.tstamp[:n])],
        edges=sorted(zip(g.ii.tolist(), g.jj.tolist())),
        poses=np.asarray(droid.video.buf.poses[:n]).copy(),
        disps=np.asarray(droid.video.buf.disps[:n]).copy(),
        wall=wall,
        mesh=g.mesh,
    )


@pytest.mark.slow
def test_edge_parallel_tracks_full_sequence_like_serial():
    serial = _run(0)
    par = _run(8)

    assert par["mesh"] is not None           # the mode actually engaged
    assert par["mesh"].devices.size == 8
    assert serial["mesh"] is None

    # identical decisions and graph structure
    assert par["counter"] == serial["counter"], (par["tstamps"],
                                                 serial["tstamps"])
    assert par["tstamps"] == serial["tstamps"]
    assert par["edges"] == serial["edges"]

    # float-tolerance state agreement (bf16 net + psum/all-gather
    # reassociation, amplified over the full sequence)
    from droid_slam_tpu.lie import se3
    import jax.numpy as jnp
    dp = np.asarray(se3.log(se3.mul(
        se3.inv(jnp.asarray(serial["poses"])), jnp.asarray(par["poses"]))))
    assert np.abs(dp).max() < 3e-2, np.abs(dp).max()
    dd = np.abs(par["disps"] - serial["disps"])
    assert dd.mean() < 0.15, dd.mean()

    # collective-overhead observation for ROOFLINE.md (8 virtual devices on
    # one core: expect ~>=1x serial wall; on real chips the per-shard conv
    # work divides while the all-gather/psum bytes stay ~2.4 MB/iter)
    print(f"serial {serial['wall']:.1f}s vs edge-parallel(8 virt) "
          f"{par['wall']:.1f}s")
