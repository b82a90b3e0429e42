"""ETH3D-SLAM RGB-D evaluation (parity with
/root/reference/evaluation_scripts/test_eth3d.py): depth-sensor tracking,
no scale correction in the ATE."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from droid_slam_tpu.config import PRESETS
from droid_slam_tpu.data.stream import eth3d_stream, eth3d_timestamps
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
    # reference's tuned ETH3D hyperparameters via PRESETS["eth3d"];
    # --image_size sets the sqrt-area resize target, reference 384x512)
    parser.add_argument("--image_size", type=int, nargs=2, default=None)
    parser.add_argument("--buffer", type=int, default=None)
    parser.add_argument("--warmup", type=int, default=None)
    parser.add_argument("--filter_thresh", type=float, default=None)
    parser.add_argument("--keyframe_thresh", type=float, default=None)
    args = parser.parse_args()

    import dataclasses
    area = (args.image_size[0] * args.image_size[1]
            if args.image_size is not None else 384 * 512)
    frames = list(eth3d_stream(args.datapath, use_depth=True,
                               target_area=area))
    h, w = frames[0][1].shape[:2]
    cfg = dataclasses.replace(PRESETS["eth3d"], depth=True,
                              image_size=(h, w), weights=args.weights,
                              asynchronous=args.asynchronous)
    overrides = {k: getattr(args, k) for k in
                 ("buffer", "warmup", "filter_thresh", "keyframe_thresh")
                 if getattr(args, k) is not None}
    cfg = dataclasses.replace(cfg, **overrides)
    droid = make_droid(cfg)
    for (t, image, depth, intrinsics) in frames:
        droid.track(t, image, depth=depth, intrinsics=intrinsics)

    traj_est = droid.terminate(
        iter([(t, im, intr) for (t, im, _, intr) in frames]),
        backend_steps=tuple(args.backend_steps))

    gt_file = os.path.join(args.datapath, "groundtruth.txt")
    gt = np.loadtxt(gt_file, skiprows=1)
    tstamps = eth3d_timestamps(args.datapath)
    result = evaluate_ate(traj_est[:, :3], gt[:, 1:4],
                          t_est=tstamps[:len(traj_est)], t_ref=gt[:, 0],
                          scale=False, max_dt=0.02)  # RGB-D: metric scale
    print(f"ATE RMSE: {result['ate_rmse']:.4f} m "
          f"({result['n_matches']} matches)")


if __name__ == "__main__":
    main()
