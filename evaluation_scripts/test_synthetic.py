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


def run(args, seed):
    import dataclasses
    cfg = dataclasses.replace(
        PRESETS["tartanair"], weights=args.weights,
        image_size=(args.height, args.width), buffer=args.buffer,
        filter_thresh=args.filter_thresh)
    droid = Droid(cfg)

    kw = dict(n_frames=args.n_frames, image_size=(args.height, args.width),
              seed=seed, step=args.step, rot_step=args.rot_step)
    for (t, image, intrinsics) in synthetic_stream(**kw):
        droid.track(float(t), image, intrinsics=intrinsics)
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
    args = parser.parse_args()

    ates = []
    for seed in args.seeds:
        ate = run(args, seed)
        ates.append(ate)
        print(f"seed {seed}: ATE RMSE {ate:.4f}")
    print(f"mean ATE RMSE over {len(ates)} seeds: "
          f"{float(np.mean(ates)):.4f}")


if __name__ == "__main__":
    main()
