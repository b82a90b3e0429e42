"""Reconstruction visualization/export.

Counterpart of the reference's Open3D/moderngl viewers
(/root/reference/droid_slam/visualization.py, visualizer/droid_visualizer.py):
filters keyframe depths by multiview consistency (depth_filter) and exports a
colored point cloud. Headless-first (PLY export, no GUI deps); an Open3D
window is used when the package is available.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..geom.filters import depth_filter, iproj_points


def reconstruction_point_cloud(video, filter_thresh=0.005, min_count=2,
                               stride=1):
    """Build a filtered colored point cloud from a DepthVideo
    (visualization.py:105-114 semantics: keep points confirmed by >= 2
    neighbors and above 0.5x mean disparity)."""
    t = video.counter
    buf = video.buf
    ix = np.arange(0, t, stride)
    poses = buf.poses
    disps = buf.disps
    intr = buf.intrinsics[0]

    thresh = filter_thresh * jnp.ones((len(ix),)) * \
        jnp.mean(disps[jnp.asarray(ix)], axis=(1, 2))
    count = depth_filter(poses, disps, intr, jnp.asarray(ix), thresh)

    pts = iproj_points(poses, disps, intr)[jnp.asarray(ix)]
    disps_ix = disps[jnp.asarray(ix)]
    masks = np.asarray((count >= min_count)
                       & (disps_ix > 0.5 * disps_ix.mean()))

    points, colors = [], []
    h, w = disps.shape[-2:]
    for k, i in enumerate(ix):
        m = masks[k].reshape(-1)
        p = np.asarray(pts[k]).reshape(-1, 3)[m]
        points.append(p)
        if video.images[i] is not None:
            img = video.images[i]
            img8 = img[3::8, 3::8] if img.shape[0] == h * 8 else img
            colors.append(img8.reshape(-1, 3)[m][:, ::-1])  # BGR->RGB
        else:
            colors.append(np.zeros_like(p, dtype=np.uint8))
    return np.concatenate(points), np.concatenate(colors)


def save_ply(path, points, colors):
    """Write an ASCII PLY point cloud (no external deps)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(points)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write("property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for p, c in zip(points, colors):
            f.write(f"{p[0]:.4f} {p[1]:.4f} {p[2]:.4f} "
                    f"{int(c[0])} {int(c[1])} {int(c[2])}\n")


def show(points, colors):
    """Open3D viewer when available; otherwise raises ImportError."""
    import open3d as o3d
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(points)
    pcd.colors = o3d.utility.Vector3dVector(colors / 255.0)
    o3d.visualization.draw_geometries([pcd])


def run_visualizer(video, stop_event, period: float = 5.0,
                   out_path: str = "reconstruction_live.ply"):
    """Live reconstruction loop (counterpart of the reference's visualizer
    process, droid.py:36-39 / visualization.py:53-160): polls the video's
    dirty flags and re-exports the filtered point cloud. Uses the Open3D
    window when the package is installed, headless PLY snapshots otherwise.

    Run in a daemon thread: Thread(target=run_visualizer, args=(video, ev)).
    """
    try:
        import open3d as o3d  # noqa: F401
        has_o3d = True
    except Exception:
        has_o3d = False

    while not stop_event.is_set():
        if video.dirty[:video.counter].any() and video.counter >= 4:
            video.dirty[:video.counter] = False
            try:
                pts, cols = reconstruction_point_cloud(video)
                if has_o3d:
                    show(pts, cols)
                else:
                    save_ply(out_path, pts, cols)
            except Exception:
                pass  # visualization must never take down tracking
        stop_event.wait(period)
