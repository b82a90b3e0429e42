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


def main():
    import jax  # noqa: E402
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from droid_slam_tpu.config import DroidConfig
    from droid_slam_tpu.slam import Droid

    H, W = 320, 512
    n_warm, n_meas = 18, 12

    cfg = DroidConfig(buffer=64, image_size=(H, W), warmup=8,
                      filter_thresh=-1.0,      # admit every frame
                      keyframe_thresh=-1.0,    # keep every keyframe
                      frontend_window=20, frontend_thresh=17.5,
                      frontend_radius=2, frontend_nms=1)
    droid = Droid(cfg)

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, size=(H, W, 3)).astype(np.uint8)
    intr = np.array([320.0, 320.0, W / 2, H / 2], np.float32)

    def frame(t):
        return np.roll(base, shift=4 * t, axis=1)

    t = 0
    for _ in range(n_warm):
        droid.track(float(t), frame(t), intrinsics=intr)
        t += 1

    jax.block_until_ready(droid.video.buf.poses)
    tic = time.perf_counter()
    for _ in range(n_meas):
        droid.track(float(t), frame(t), intrinsics=intr)
        t += 1
    jax.block_until_ready(droid.video.buf.poses)
    dt = time.perf_counter() - tic

    fps = n_meas / dt
    print(json.dumps({
        "metric": "keyframe_fps_euroc_mono_320x512",
        "value": round(fps, 3),
        "unit": "keyframes/s",
        "vs_baseline": round(fps / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
