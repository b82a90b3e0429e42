"""Offline viewer/exporter for saved reconstructions
(parity with /root/reference/view_reconstruction.py:16-69)."""

import argparse

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--reconstruction_path", required=True,
                        help=".npz saved by demo.py --reconstruction_path")
    parser.add_argument("--ply", default=None, help="export PLY instead of "
                        "opening a viewer")
    parser.add_argument("--filter_thresh", type=float, default=0.005)
    args = parser.parse_args()

    import jax.numpy as jnp
    from droid_slam_tpu.geom.filters import depth_filter, iproj_points
    from droid_slam_tpu.eval.visualization import save_ply, show

    data = np.load(args.reconstruction_path)
    poses = jnp.asarray(data["poses"])
    disps_full = data["disps"]
    # operate at 1/8 resolution like the live viewer
    disps = jnp.asarray(disps_full[:, 3::8, 3::8]
                        if disps_full.ndim == 3 and
                        disps_full.shape[1] % 8 == 0 else disps_full)
    intr = jnp.asarray(data["intrinsics"][0])
    t = poses.shape[0]

    thresh = args.filter_thresh * jnp.ones((t,)) * jnp.mean(disps,
                                                            axis=(1, 2))
    count = depth_filter(poses, disps, intr, jnp.arange(t), thresh)
    pts = iproj_points(poses, disps, intr)
    mask = np.asarray((count >= 2) & (disps > 0.5 * disps.mean()))

    images = data["images"]
    h, w = disps.shape[-2:]
    points, colors = [], []
    for i in range(t):
        m = mask[i].reshape(-1)
        points.append(np.asarray(pts[i]).reshape(-1, 3)[m])
        img8 = images[i][3::8, 3::8] if images[i].shape[0] == 8 * h \
            else images[i]
        colors.append(img8.reshape(-1, 3)[m][:, ::-1])
    points = np.concatenate(points)
    colors = np.concatenate(colors)

    if args.ply:
        save_ply(args.ply, points, colors)
        print(f"wrote {len(points)} points to {args.ply}")
    else:
        show(points, colors)


if __name__ == "__main__":
    main()
