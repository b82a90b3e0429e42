"""Demo CLI: run SLAM on a directory of images.

Parity with /root/reference/demo.py:26-137 — calibration-file intrinsics with
optional undistortion, resize so the area is ~384*512 with dims a multiple of
8, track every stride-th frame, then global BA + trajectory fill.
"""

import argparse
import glob
import os

import numpy as np


def image_stream(imagedir, calib, stride):
    """demo.py:26-57: yields (t, image[H,W,3] BGR uint8, intrinsics[4])."""
    import cv2

    calib = np.loadtxt(calib, delimiter=" ")
    fx, fy, cx, cy = calib[:4]
    K = np.eye(3)
    K[0, 0], K[0, 2], K[1, 1], K[1, 2] = fx, cx, fy, cy

    paths = sorted(glob.glob(os.path.join(imagedir, "*.png"))
                   + glob.glob(os.path.join(imagedir, "*.jpg")))

    for t, imfile in enumerate(paths[::stride]):
        image = cv2.imread(imfile)
        if len(calib) > 4:
            image = cv2.undistort(image, K, calib[4:])

        h0, w0 = image.shape[:2]
        h1 = int(h0 * np.sqrt((384 * 512) / (h0 * w0)))
        w1 = int(w0 * np.sqrt((384 * 512) / (h0 * w0)))
        image = cv2.resize(image, (w1, h1))
        image = image[: h1 - h1 % 8, : w1 - w1 % 8]

        intrinsics = np.array([fx, fy, cx, cy], np.float32)
        intrinsics[0::2] *= w1 / w0
        intrinsics[1::2] *= h1 / h0
        yield t, image, intrinsics


def save_reconstruction(droid, path):
    """demo.py:60-76: dump keyframe state for offline viewing."""
    t = droid.video.counter
    buf = droid.video.buf
    np.savez(
        path,
        tstamps=np.asarray(buf.tstamp[:t]),
        poses=np.asarray(buf.poses[:t]),
        disps=np.asarray(buf.disps_up[:t]) if droid.config.upsample
        else np.asarray(buf.disps[:t]),
        intrinsics=np.asarray(buf.intrinsics[:t]),
        images=np.stack(droid.video.images[:t], 0),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--imagedir", required=True)
    parser.add_argument("--calib", required=True)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--buffer", type=int, default=512)
    parser.add_argument("--image_size", default=[240, 320], type=int,
                        nargs="+")
    parser.add_argument("--filter_thresh", type=float, default=2.4)
    parser.add_argument("--warmup", type=int, default=8)
    parser.add_argument("--keyframe_thresh", type=float, default=4.0)
    parser.add_argument("--frontend_thresh", type=float, default=16.0)
    parser.add_argument("--frontend_window", type=int, default=25)
    parser.add_argument("--frontend_radius", type=int, default=2)
    parser.add_argument("--frontend_nms", type=int, default=1)
    parser.add_argument("--backend_thresh", type=float, default=22.0)
    parser.add_argument("--backend_radius", type=int, default=2)
    parser.add_argument("--backend_nms", type=int, default=3)
    parser.add_argument("--beta", type=float, default=0.3)
    parser.add_argument("--stride", type=int, default=1)
    parser.add_argument("--upsample", action="store_true")
    parser.add_argument("--backend_steps", type=int, nargs="*",
                        default=[7, 12])
    parser.add_argument("--asynchronous", action="store_true",
                        help="concurrent global-BA backend (DroidAsync; "
                             "set DROID_ASYNC_PROCESS=1 for the "
                             "process-isolated variant)")
    parser.add_argument("--reconstruction_path", default=None)
    parser.add_argument("--trajectory_path", default="trajectory.txt")
    parser.add_argument("--disable_vis", action="store_true")
    parser.add_argument("--screenshot", default=None,
                        help="render the final reconstruction (point cloud "
                             "+ camera frusta) to this PNG via the "
                             "offscreen software rasterizer — works fully "
                             "headless, unlike the reference's GL viewer")
    args = parser.parse_args()

    from droid_slam_tpu.config import DroidConfig
    from droid_slam_tpu.slam import make_droid

    droid = None
    for t, image, intrinsics in image_stream(args.imagedir, args.calib,
                                             args.stride):
        if droid is None:
            cfg = DroidConfig(
                buffer=args.buffer, image_size=tuple(image.shape[:2]),
                filter_thresh=args.filter_thresh, warmup=args.warmup,
                keyframe_thresh=args.keyframe_thresh,
                frontend_thresh=args.frontend_thresh,
                frontend_window=args.frontend_window,
                frontend_radius=args.frontend_radius,
                frontend_nms=args.frontend_nms,
                backend_thresh=args.backend_thresh,
                backend_radius=args.backend_radius,
                backend_nms=args.backend_nms, beta=args.beta,
                upsample=args.upsample, weights=args.weights,
                asynchronous=args.asynchronous)
            droid = make_droid(cfg)
        droid.track(t, image, intrinsics=intrinsics)

    stream = image_stream(args.imagedir, args.calib, args.stride)
    if args.asynchronous:
        # async facades own their backend schedule (droid_async.py:200-215)
        traj = droid.terminate(stream)
    else:
        traj = droid.terminate(stream,
                               backend_steps=tuple(args.backend_steps))
    np.savetxt(args.trajectory_path, traj)
    print(f"saved trajectory [{traj.shape[0]},7] to {args.trajectory_path}")

    if args.reconstruction_path:
        save_reconstruction(droid, args.reconstruction_path)

    if args.screenshot:
        from droid_slam_tpu.eval.viewer import save_screenshot
        if save_screenshot(args.screenshot, droid.video):
            print(f"saved reconstruction render to {args.screenshot}")


if __name__ == "__main__":
    main()
