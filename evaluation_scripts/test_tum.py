"""TUM-RGBD monocular evaluation (parity with
/root/reference/evaluation_scripts/test_tum.py): stride-2 tracking, ATE with
Sim3 alignment against groundtruth.txt."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from droid_slam_tpu.config import PRESETS
from droid_slam_tpu.data.stream import tum_stream, tum_timestamps
from droid_slam_tpu.eval.ate import evaluate_ate
from droid_slam_tpu.slam import make_droid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--asynchronous", action="store_true")
    parser.add_argument("--backend_steps", type=int, nargs="+",
                        default=[7, 12])
    # overrides for reduced-resolution / fixture runs (defaults = the
    # reference's tuned TUM hyperparameters via PRESETS["tum"])
    parser.add_argument("--image_size", type=int, nargs=2, default=None)
    parser.add_argument("--buffer", type=int, default=None)
    parser.add_argument("--warmup", type=int, default=None)
    parser.add_argument("--filter_thresh", type=float, default=None)
    parser.add_argument("--keyframe_thresh", type=float, default=None)
    args = parser.parse_args()

    import dataclasses
    cfg = dataclasses.replace(PRESETS["tum"], weights=args.weights,
                              asynchronous=args.asynchronous)
    overrides = {k: getattr(args, k) for k in
                 ("buffer", "warmup", "filter_thresh", "keyframe_thresh")
                 if getattr(args, k) is not None}
    if args.image_size is not None:
        overrides["image_size"] = tuple(args.image_size)
    cfg = dataclasses.replace(cfg, **overrides)
    droid = make_droid(cfg)

    stream = tum_stream(args.datapath, stride=2, image_size=cfg.image_size)
    for (t, image, intrinsics) in stream:
        droid.track(t, image, intrinsics=intrinsics)

    traj_est = droid.terminate(iter(stream),
                               backend_steps=tuple(args.backend_steps))

    tstamps = tum_timestamps(args.datapath, stride=2)
    gt = np.loadtxt(os.path.join(args.datapath, "groundtruth.txt"),
                    skiprows=1 if _has_header(
                        os.path.join(args.datapath, "groundtruth.txt"))
                    else 0)
    result = evaluate_ate(traj_est[:, :3], gt[:, 1:4],
                          t_est=tstamps[:len(traj_est)], t_ref=gt[:, 0],
                          scale=True, max_dt=0.02)
    print(f"ATE RMSE: {result['ate_rmse']:.4f} m "
          f"({result['n_matches']} matches)")


def _has_header(path):
    with open(path) as f:
        return f.readline().startswith("#")


if __name__ == "__main__":
    main()
