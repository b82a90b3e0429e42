"""EuRoC evaluation (parity with /root/reference/evaluation_scripts/test_euroc.py):
track at stride 2, fill poses at stride 1, evaluate Sim3-aligned ATE against
the TUM-format ground truth with the 1.10 position scale factor."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from droid_slam_tpu.config import PRESETS, EUROC_SCALE_FACTOR
from droid_slam_tpu.data.stream import euroc_stream, euroc_timestamps
from droid_slam_tpu.eval.ate import evaluate_ate
from droid_slam_tpu.slam import make_droid


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--asynchronous", action="store_true")
    parser.add_argument("--stereo", action="store_true")
    parser.add_argument("--backend_steps", type=int, nargs="+",
                        default=[7, 12])
    # overrides for reduced-resolution / fixture runs (defaults = the
    # reference's tuned EuRoC hyperparameters via PRESETS["euroc"])
    parser.add_argument("--image_size", type=int, nargs=2, default=None)
    parser.add_argument("--buffer", type=int, default=None)
    parser.add_argument("--warmup", type=int, default=None)
    parser.add_argument("--filter_thresh", type=float, default=None)
    parser.add_argument("--keyframe_thresh", type=float, default=None)
    args = parser.parse_args()

    import dataclasses
    cfg = dataclasses.replace(PRESETS["euroc"], stereo=args.stereo,
                              weights=args.weights,
                              asynchronous=args.asynchronous)
    overrides = {k: getattr(args, k) for k in
                 ("buffer", "warmup", "filter_thresh", "keyframe_thresh")
                 if getattr(args, k) is not None}
    if args.image_size is not None:
        overrides["image_size"] = tuple(args.image_size)
    cfg = dataclasses.replace(cfg, **overrides)
    droid = make_droid(cfg)

    images = euroc_stream(args.datapath, stereo=args.stereo, stride=1,
                          image_size=cfg.image_size)
    for (t, image, intrinsics) in images[::2]:  # track at stride 2
        droid.track(t, image, intrinsics=intrinsics)

    traj_est = droid.terminate(iter(images),
                               backend_steps=tuple(args.backend_steps))

    # GT: data/euroc_groundtruth/*.txt, "#timestamp [ns] x y z qw qx qy qz"
    tstamps = euroc_timestamps(args.datapath)
    gt = np.loadtxt(args.gt, delimiter=" ", skiprows=1)
    t_ref = gt[:, 0] / 1e9 if gt[0, 0] > 1e14 else gt[:, 0]
    result = evaluate_ate(EUROC_SCALE_FACTOR * traj_est[:, :3], gt[:, 1:4],
                          t_est=tstamps[:len(traj_est)] / 1e9,
                          t_ref=t_ref, scale=True, max_dt=0.1)
    print(f"ATE RMSE: {result['ate_rmse']:.4f} m "
          f"(scale {result['scale']:.3f}, {result['n_matches']} matches)")


if __name__ == "__main__":
    main()
