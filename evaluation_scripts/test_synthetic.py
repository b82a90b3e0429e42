"""Synthetic-scene evaluation: full SLAM run + ATE against exact GT.

No-download accuracy harness (the deployment has no network egress for
TartanAir/EuRoC imagery): renders a procedural box-scene trajectory
(droid_slam_tpu/data/synthetic.py), tracks it with the full Droid pipeline,
and reports Sim3-aligned ATE against the exact ground-truth poses. Mirrors
the shape of evaluation_scripts/test_tartanair.py.

Use --weights to evaluate a trained checkpoint (e.g. from
`python train.py --datasets synthetic`); omit it for the random-init
baseline the checkpoint should beat.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from droid_slam_tpu.config import PRESETS
from droid_slam_tpu.data.synthetic import (synthetic_groundtruth,
                                           synthetic_stream)
from droid_slam_tpu.eval.ate import evaluate_ate
from droid_slam_tpu.slam import Droid


def run(args, seed, weights=None):
    import dataclasses
    cfg = dataclasses.replace(
        PRESETS["tartanair"], weights=weights,
        image_size=(args.height, args.width), buffer=args.buffer,
        filter_thresh=args.filter_thresh,
        asynchronous=getattr(args, "asynchronous", False))
    if cfg.asynchronous:
        from droid_slam_tpu.slam.async_droid import DroidAsync
        droid = DroidAsync(cfg, sleep_time=2.0)
    else:
        droid = Droid(cfg)

    kw = dict(n_frames=args.n_frames, image_size=(args.height, args.width),
              seed=seed, step=args.step, rot_step=args.rot_step)
    for (t, image, intrinsics) in synthetic_stream(**kw):
        droid.track(float(t), image, intrinsics=intrinsics)
    if cfg.asynchronous:
        traj_est = droid.terminate(synthetic_stream(**kw))
    else:
        traj_est = droid.terminate(synthetic_stream(**kw),
                                   backend_steps=tuple(args.backend_steps))

    gt = synthetic_groundtruth(**kw)
    result = evaluate_ate(traj_est[:, :3], gt[:, :3], scale=True)
    return result["ate_rmse"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", default=None)
    parser.add_argument("--n_frames", type=int, default=120)
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--width", type=int, default=512)
    parser.add_argument("--buffer", type=int, default=256)
    parser.add_argument("--step", type=float, default=0.10)
    parser.add_argument("--rot_step", type=float, default=0.03)
    parser.add_argument("--filter_thresh", type=float, default=1.75)
    parser.add_argument("--seeds", type=int, nargs="+", default=[7])
    parser.add_argument("--backend_steps", type=int, nargs="+",
                        default=[7, 12])
    parser.add_argument("--asynchronous", action="store_true",
                        help="DroidAsync (concurrent global-BA backend) "
                             "instead of the sync pipeline — for the "
                             "async-vs-sync accuracy delta "
                             "(reference README.md:140 claims async is "
                             "typically MORE accurate)")
    parser.add_argument("--compare_random", action="store_true",
                        help="also evaluate a random-init model in the same "
                             "process (shares every jit compile with the "
                             "--weights run — each compile costs minutes on "
                             "the tunneled TPU)")
    args = parser.parse_args()

    variants = [("weights", args.weights)]
    if args.compare_random or args.weights is None:
        variants += [("random-init", None)]
        if args.weights is None:
            variants = variants[1:]

    results = {}
    for tag, weights in variants:
        ates = []
        for seed in args.seeds:
            ate = run(args, seed, weights=weights)
            ates.append(ate)
            print(f"[{tag}] seed {seed}: ATE RMSE {ate:.4f}", flush=True)
        results[tag] = float(np.mean(ates))
        print(f"[{tag}] mean ATE RMSE over {len(ates)} seeds: "
              f"{results[tag]:.4f}", flush=True)
    if len(results) > 1:
        print("summary:", {k: round(v, 4) for k, v in results.items()})


if __name__ == "__main__":
    main()
