"""Global bundle adjustment at reference scale: t≈1000 keyframes on real TPU.

VERDICT r3 item 2: the presets allow buffer=1000/1024 (tartanair/eth3d,
SURVEY.md §2.4) where the dense Schur system is a [1024,1024,6,6] grid and a
6144^2 fp32 Cholesky, but nothing showed global BA at that scale is correct
AND affordable. This drives the REAL backend path — proximity proposal over
all t^2 pairs, chunked alt-corr GRU sweeps, the full Schur/Cholesky BA — on a
synthetic 1000-keyframe video at the TartanAir evaluation resolution, then
records per-stage wall times, per-step BA time, device memory, and solution
health to BENCH_BA.json.

Reference path being matched: droid_backend.py:24-42 + factor_graph.py:267-330
+ src/droid_kernels.cu:1126-1443 (the reference needs a 24 GB-class GPU for
this workload, BASELINE.md).

Usage:  python tools/bench_global_ba.py [--t 1000] [--height 384 --width 512]
        [--steps 7 12] [--out BENCH_BA.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_bench"))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    # Default resolution is the TUM preset (240x320): the algorithm's
    # per-edge GRU hidden state is ~E*hw*128 bf16 bytes — at 384x512 and
    # max_factors=16*1000 that is ~13 GB ALONE (the reference needs a 24 GB
    # GPU for exactly this workload, BASELINE.md); one 16 GB v5e holds the
    # full t=1000 system at 240x320, or ~t<=500 at 320x512.
    ap.add_argument("--t", type=int, default=1000)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=320)
    ap.add_argument("--steps", type=int, nargs="+", default=[7, 12])
    ap.add_argument("--out", default="BENCH_BA.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from droid_slam_tpu.config import DroidConfig
    from droid_slam_tpu.data.synthetic import (random_trajectory,
                                               poses_c2w_from_mats)
    from droid_slam_tpu.lie import se3
    from droid_slam_tpu.models import nets
    from droid_slam_tpu.slam.backend import DroidBackend
    from droid_slam_tpu.state.video import DepthVideo

    t = args.t
    H, W = args.height, args.width
    h, w = H // 8, W // 8
    rng = np.random.default_rng(0)

    tic = time.perf_counter()
    video = DepthVideo(image_size=(H, W), buffer=t + 8)
    Rs, ts = random_trajectory(t, rng, step=0.04, rot_step=0.01)
    poses_w2c = np.asarray(se3.inv(jnp.asarray(poses_c2w_from_mats(Rs, ts))))
    B = video.buf.poses.shape[0]
    pad = np.broadcast_to(np.asarray(se3.identity()), (B - t, 7))
    video.buf = video.buf._replace(
        tstamp=jnp.arange(B, dtype=jnp.float32),
        poses=jnp.asarray(np.concatenate([poses_w2c, pad],
                                         axis=0).astype(np.float32)),
        disps=jnp.asarray(
            rng.uniform(0.8, 1.2, size=(B, h, w)).astype(np.float32)),
        intrinsics=jnp.broadcast_to(
            jnp.asarray([0.8 * w, 0.8 * w, w / 2, h / 2], jnp.float32),
            (B, 4)).copy(),
        fmaps=jnp.asarray(rng.normal(size=video.buf.fmaps.shape)
                          .astype(np.float32), jnp.bfloat16),
        nets=jnp.asarray(rng.normal(size=video.buf.nets.shape)
                         .astype(np.float32) * 0.1, jnp.bfloat16),
        inps=jnp.asarray(rng.normal(size=video.buf.inps.shape)
                         .astype(np.float32) * 0.1, jnp.bfloat16),
    )
    video.counter = t
    video.dirty[:t] = True
    jax.block_until_ready(video.buf.poses)
    t_setup = time.perf_counter() - tic

    # TartanAir evaluation preset (SURVEY.md §2.4 / test_tartanair.py)
    cfg = DroidConfig(buffer=t + 8, image_size=(H, W), beta=0.3,
                      backend_thresh=20.0, backend_radius=2, backend_nms=3)
    params = nets.init_params(jax.random.PRNGKey(0))
    backend = DroidBackend(params, video, cfg)

    stages = {"setup_s": round(t_setup, 2)}
    step_times = []
    diag = {}

    # instrument the per-step loop: every global-BA step ends in exactly
    # one _lowmem_ba_step dispatch (resident AND spilled paths), so timing
    # from step start (the previous BA's return) to its completion times
    # the whole sweep+BA step including host<->device nets streaming.
    from droid_slam_tpu.state import graph as graph_mod
    orig_ba = graph_mod._lowmem_ba_step
    last = [None]

    def timed_ba(*a, **k):
        out = orig_ba(*a, **k)
        jax.block_until_ready(out[0])
        now = time.perf_counter()
        if last[0] is not None:
            step_times.append(now - last[0])
        last[0] = now
        return out

    orig_groups = graph_mod.FactorGraph._lowmem_make_groups

    def spy_groups(self, chunks, *a, **k):
        groups = orig_groups(self, chunks, *a, **k)
        diag.update(
            n_edges=len(self.edges), capacity=self.capacity,
            spilled=self._lowmem_spilled_last,
            n_chunks=len(chunks),
            max_chunk=max(len(v) for v in chunks),
            n_groups=len(groups),
            group_shapes=[list(np.asarray(g["ii"]).shape) for g in groups])
        return groups

    graph_mod._lowmem_ba_step = timed_ba
    graph_mod.FactorGraph._lowmem_make_groups = spy_groups
    try:
        for i, steps in enumerate(args.steps):
            tic = time.perf_counter()
            last[0] = tic
            backend(steps=steps, normalize=(i == 0))
            stages[f"backend_pass{i}_steps{steps}_s"] = round(
                time.perf_counter() - tic, 2)
    finally:
        graph_mod._lowmem_ba_step = orig_ba
        graph_mod.FactorGraph._lowmem_make_groups = orig_groups

    poses = np.asarray(video.buf.poses[:t])
    disps = np.asarray(video.buf.disps[:t])
    qn = np.linalg.norm(poses[:, 3:], axis=-1)
    health = {
        "poses_finite": bool(np.isfinite(poses).all()),
        "disps_finite_pos": bool(np.isfinite(disps).all()
                                 and (disps > 0).all()),
        "quat_norm_max_err": float(np.abs(qn - 1.0).max()),
    }

    mem = {}
    try:
        st = jax.local_devices()[0].memory_stats()
        if st:
            mem = {k: int(v) for k, v in st.items()
                   if k in ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit")}
    except Exception:
        pass

    # step_times[0] of each pass includes the remote compile; steady state is
    # the median of the rest
    warm = step_times[1:] if len(step_times) > 1 else step_times
    result = {
        "metric": "global_ba_step_time_t%d_%dx%d" % (t, H, W),
        "value": round(float(np.median(warm)), 3),
        "unit": "s/step",
        "t_keyframes": t,
        "n_steps_total": len(step_times),
        "step_times_s": [round(s, 3) for s in step_times],
        "stages": stages,
        "graph": diag,
        "health": health,
        "device": str(jax.devices()[0].device_kind),
        "memory": mem,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
