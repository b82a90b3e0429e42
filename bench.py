"""Benchmark: steady-state keyframe tracking rate on the real TPU chip.

Drives the actual Droid.track() loop (motion filter -> frontend updates ->
windowed dense BA) on synthetic frames at the EuRoC evaluation resolution
(320x512, SURVEY.md §2.4) with every frame admitted as a keyframe, and
reports keyframes tracked per second once compiles have warmed up.

Baseline: the reference paper reports ~10 FPS camera-rate tracking on an
RTX 3090 (BASELINE.md); vs_baseline = keyframe_fps / 10.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": ...,
"vs_baseline": ...}.
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_bench"))

import numpy as np  # noqa: E402


def bench_parts():
    """Time the individual jitted stages on device (diagnostic mode)."""
    import time
    import jax
    import jax.numpy as jnp
    from droid_slam_tpu.models import nets
    from droid_slam_tpu.ops import corr as corr_ops
    from droid_slam_tpu.ba import inference as ba_inf
    from droid_slam_tpu.lie import se3

    H, W = 320, 512
    h, w = H // 8, W // 8
    hw = h * w
    params = nets.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def timeit(name, fn, *args, n=8):
        out = fn(*args)
        jax.block_until_ready(out)
        tic = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:30s} {(time.perf_counter() - tic) / n * 1000:8.2f} ms")
        return out

    img = jnp.asarray(rng.integers(0, 255, size=(1, H, W, 3)), jnp.uint8)
    enc = jax.jit(lambda p, x: nets.extract_features(p, x, jnp.bfloat16))
    timeit("extract_features", enc, params, img)

    E = 48
    fm = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32) / 8,
                     jnp.bfloat16)
    pyr = timeit("corr volume build (48e)",
                 jax.jit(corr_ops.build_pyramid), fm, fm)
    coords = jnp.asarray(
        rng.uniform(0, [w, h], size=(E, h, w, 2)).astype(np.float32))
    timeit("corr volume lookup (48e)",
           lambda *a: corr_ops.lookup_pyramid(pyr, coords))

    fpyr = corr_ops.build_fmap_pyramid(
        jnp.asarray(rng.normal(size=(64, h, w, 128)).astype(np.float32),
                    jnp.bfloat16))
    ii = jnp.asarray(rng.integers(0, 64, size=E))
    jj = jnp.asarray(rng.integers(0, 64, size=E))
    timeit("altcorr lookup (48e)",
           lambda *a: corr_ops.alt_lookup(fpyr, coords, ii, jj))

    net = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.bfloat16)
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.bfloat16)
    cor = jnp.asarray(rng.normal(size=(E, h, w, 196)), jnp.bfloat16)
    mot = jnp.asarray(rng.normal(size=(E, h, w, 4)), jnp.bfloat16)
    upd = jax.jit(lambda p, *a: nets.update_module(p, *a, ii=ii % 32,
                                                   num_frames=32))
    timeit("update_module (48e)", upd, params, net, inp, cor, mot)

    # windowed BA: 32-frame window, 96 edges, 2 GN iters
    B = 64
    ii_np = rng.integers(1, 30, size=96)
    jj_np = rng.integers(1, 30, size=96)
    shape, plan = ba_inf.build_plan(ii_np, jj_np, 2, 30, iters=2)
    poses = jnp.broadcast_to(se3.identity(), (B, 7)).copy()
    xi = jnp.asarray(0.01 * rng.normal(size=(B, 6)).astype(np.float32))
    poses = se3.exp(xi)
    disps = jnp.ones((B, h, w), jnp.float32)
    sens = jnp.zeros((B, h, w), jnp.float32)
    damp = 1e-6 * jnp.ones((B, h, w), jnp.float32)
    intr = jnp.asarray([320.0, 320.0, w / 2, h / 2])
    tgt = jnp.asarray(rng.uniform(0, [w], size=(shape.edges, 2, hw))
                      .astype(np.float32))
    wgt = jnp.ones((shape.edges, 2, hw), jnp.float32)

    def ba_run(p, d):
        return ba_inf.ba_windowed(shape, p, d, sens, damp, intr, tgt, wgt,
                                  plan, 1e-4, 0.1)
    out = ba_run(poses, disps)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    n = 8
    for _ in range(n):
        out = ba_run(*out)
    jax.block_until_ready(out)
    print(f"{'ba_windowed 2GN (96e,w32)':30s} "
          f"{(time.perf_counter() - tic) / n * 1000:8.2f} ms")


def main():
    import jax  # noqa: E402
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from droid_slam_tpu.config import DroidConfig
    from droid_slam_tpu.slam import Droid

    use_async = "--async" in sys.argv
    H, W = 320, 512
    # warmup must cover every compile path (init, steady updates, the first
    # age-based evictions at frame ~21). Measurement runs as MULTIPLE
    # independent windows (VERDICT r2: single-window numbers swing ~40% on
    # tunnel weather); the JSON value is the MEDIAN window fps, with
    # min/max/spread reported so outlier windows are visible in the record.
    n_warm, n_windows, n_meas = 26, 3, 12

    # buffer must cover warmup + the MAX retry-window frame count (every
    # frame is admitted and kept): 26 + 6*12 = 98. At 64 a variance-retry
    # run crashed with "DepthVideo buffer full" (round-4 bench_async.err).
    cfg = DroidConfig(buffer=104, image_size=(H, W), warmup=8,
                      filter_thresh=-1.0,      # admit every frame
                      keyframe_thresh=-1.0,    # keep every keyframe
                      frontend_window=20, frontend_thresh=17.5,
                      frontend_radius=2, frontend_nms=1)
    if use_async:
        from droid_slam_tpu.slam.async_droid import DroidAsync
        droid = DroidAsync(cfg, sleep_time=2.0, backend_iters=4)
    else:
        droid = Droid(cfg)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
    intr = np.array([320.0, 320.0, W / 2, H / 2], np.float32)

    def frame(t):
        return np.roll(base, shift=4 * t, axis=1)

    trace = os.environ.get("BENCH_TRACE", "") == "1"
    profile_dir = os.environ.get("BENCH_PROFILE", "")
    t = 0
    for _ in range(n_warm):
        tic = time.perf_counter()
        droid.track(float(t), frame(t), intrinsics=intr)
        if trace:
            jax.block_until_ready(droid.video.buf.poses)
            print(f"warm frame {t}: "
                  f"{(time.perf_counter() - tic) * 1000:.0f} ms", flush=True)
        t += 1

    jax.block_until_ready(droid.video.buf.poses)
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    window_fps = []
    max_windows = 6  # retry budget when a window catches a compile/stall

    def run_window():
        nonlocal t
        tic = time.perf_counter()
        for _ in range(n_meas):
            tif = time.perf_counter()
            droid.track(float(t), frame(t), intrinsics=intr)
            if trace:
                jax.block_until_ready(droid.video.buf.poses)
                print(f"meas frame {t}: "
                      f"{(time.perf_counter() - tif) * 1000:.0f} ms",
                      flush=True)
            t += 1
        jax.block_until_ready(droid.video.buf.poses)
        window_fps.append(n_meas / (time.perf_counter() - tic))

    for _w in range(n_windows):
        run_window()
    # variance control (VERDICT r2): if the windows disagree by >15%, one of
    # them caught a recompile or a tunnel stall — run extra windows (the
    # median absorbs the outlier) instead of publishing a coin flip.
    while ((max(window_fps) - min(window_fps)) / np.median(window_fps) > 0.15
           and len(window_fps) < max_windows):
        import sys as _s
        print(f"bench: window spread >15% "
              f"({['%.2f' % f for f in sorted(window_fps)]}) — "
              f"running an extra window", file=_s.stderr, flush=True)
        run_window()
    if profile_dir:
        jax.profiler.stop_trace()

    window_fps.sort()
    fps = float(np.median(window_fps))
    spread = (window_fps[-1] - window_fps[0]) / fps
    if spread > 0.15:
        import sys as _s
        print(f"WARNING: bench window spread {spread:.1%} > 15% — tunnel "
              f"variance; windows={['%.2f' % f for f in window_fps]}",
              file=_s.stderr, flush=True)
    result = {
        "metric": ("keyframe_fps_euroc_mono_320x512_async" if use_async
                   else "keyframe_fps_euroc_mono_320x512"),
        "value": round(fps, 3),
        "unit": "keyframes/s",
        "vs_baseline": round(fps / 10.0, 3),
        "windows": [round(f, 3) for f in window_fps],
        "spread": round(spread, 4),
        # provenance (VERDICT r3 item 8): the exact tree + env the number
        # was measured under, so a notes-vs-record discrepancy is visible
        # in the record itself.
        "sha": _git_sha(),
        "env_overrides": {k: v for k, v in sorted(os.environ.items())
                          if k.startswith(("DROID_", "BENCH_"))},
    }

    # speculation health (slam/droid.py speculative dispatch): rates of
    # full mis-speculation unwinds and proposal-distance ring misses over
    # every tracked frame. The strict-vs-speculative trajectory delta is
    # pinned bit-exact by tests/test_spec_frame.py (incl. keyframe-removal
    # events), so nonzero rates here cost only re-dispatch time, not ATE.
    n_frames = n_warm + n_windows * n_meas
    result["spec_mis_rate"] = round(
        getattr(droid, "_spec_mis", 0) / n_frames, 4)
    result["spec_dist_miss_rate"] = round(
        getattr(droid, "_spec_dist_miss", 0) / n_frames, 4)

    # MFU: model FLOPs of the steady frame at the LIVE bucket shapes
    # (tools/flops_model.py, costed on the CPU backend in a subprocess so
    # no TPU recompile happens here) against the chip's bf16 peak.
    try:
        result["mfu"] = round(_measure_mfu(droid, fps, H, W), 4)
    except Exception as e:  # never let accounting kill the bench number
        result["mfu_error"] = str(e)[:120]

    # the second half of the pipeline (droid.py:71-86): full terminate() —
    # backend global BA passes (7, 12) + trajectory filler — timed at the
    # bench state (~98 keyframes). The filler stream interleaves one
    # fresh non-keyframe per two keyframes so the motion-only BA fill is
    # actually exercised (every tracked frame was admitted as a keyframe).
    if not use_async and os.environ.get("BENCH_TERMINATE", "1") == "1":
        def filler_stream():
            for k in range(0, t, 2):
                yield k + 0.5, frame(k) if k % 4 else frame(k + 1), intr
        try:
            traj = droid.terminate(stream=filler_stream())
            ts = dict(droid.terminate_stats)
            ts["filler_frames"] = (t + 1) // 2
            ts["keyframes"] = int(droid.video.counter)
            ts["traj_finite"] = bool(np.isfinite(traj).all())
            result["terminate"] = ts
        except Exception as e:  # never let terminate kill the fps record
            result["terminate_error"] = str(e)[:160]
        print(json.dumps(result))
        return

    print(json.dumps(result))
    if use_async:
        # stop AND join: letting the daemon thread die at interpreter
        # teardown aborts the process if it is mid-dispatch (the PJRT
        # runtime is torn down under it — observed exit 134 in round 4)
        droid._stop.set()
        droid._thread.join(timeout=120)


def _git_sha():
    import subprocess
    try:
        out = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10)
        sha = out.stdout.strip()
        dirty = subprocess.run(
            ["git", "status", "--porcelain"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            capture_output=True, text=True, timeout=10).stdout.strip()
        return sha + ("-dirty" if dirty else "")
    except Exception:
        return "unknown"


def _measure_mfu(droid, fps, H, W):
    import subprocess
    import sys as _sys

    import jax

    shape = droid._last_tables["ba_shape"]
    g = droid.frontend.graph
    iters = (int(droid._last_sc.get("n_iters", 3))
             + int(droid._last_sc.get("n_iters2", 2)))
    args = [_sys.executable, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools", "flops_model.py"),
        "--height", str(H), "--width", str(W),
        "--slots", str(g.net.shape[0]),
        "--ba_edges", str(shape.edges), "--window", str(shape.window),
        "--rmax", str(shape.rmax), "--iters", str(iters),
        "--lookup_impl", str(g.lookup_impl)]
    env = dict(os.environ, JAX_PLATFORM_NAME="cpu", JAX_PLATFORMS="cpu")
    out = subprocess.run(args, env=env, capture_output=True, text=True,
                         timeout=900)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-200:])
    flops = json.loads(out.stdout.strip().splitlines()[-1])["flops_per_frame"]

    from tools.flops_model import peak_for
    peak = peak_for(jax.devices()[0].device_kind)
    return fps * flops / peak


if __name__ == "__main__":
    import sys
    if "--parts" in sys.argv:
        bench_parts()
    else:
        main()
