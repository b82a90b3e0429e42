"""Dataset utilities: TUM-format loading, timestamp association, all-pairs
flow-distance matrices for covisibility graphs.

Parity with /root/reference/droid_slam/data_readers/rgbd_utils.py, with the
flow computation running through our JAX geometry instead of lietorch.
"""

from __future__ import annotations

import os.path as osp

import numpy as np
import jax.numpy as jnp

from ..geom import projective as pops
from ..lie import se3


def parse_list(filepath, skiprows=0):
    return np.loadtxt(filepath, delimiter=" ", dtype=np.str_,
                      skiprows=skiprows)


def _nearest(ref, query):
    """For each query timestamp, the index of the closest ref timestamp and
    the residual |ref[j] - query|. Fully vectorized (O(N*M) broadcast —
    TUM-scale streams are a few thousand frames)."""
    ref = np.asarray(ref, np.float64)
    query = np.asarray(query, np.float64)
    j = np.abs(query[:, None] - ref[None, :]).argmin(axis=1)
    return j, np.abs(ref[j] - query)


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose=None,
                     max_dt=1.0):
    """Nearest-timestamp matching of image frames to depth (and optionally
    pose) streams; frames without a match within max_dt are dropped.
    Behavior of /root/reference/droid_slam/data_readers/rgbd_utils.py:16-33,
    vectorized."""
    jd, err_d = _nearest(tstamp_depth, tstamp_image)
    if tstamp_pose is None:
        keep = np.nonzero(err_d < max_dt)[0]
        return [(int(i), int(jd[i])) for i in keep]
    jp, err_p = _nearest(tstamp_pose, tstamp_image)
    keep = np.nonzero((err_d < max_dt) & (err_p < max_dt))[0]
    return [(int(i), int(jd[i]), int(jp[i])) for i in keep]


def _first_existing(datapath, names):
    for n in names:
        p = osp.join(datapath, n)
        if osp.isfile(p):
            return p
    return None


def loadtum(datapath, frame_rate=-1):
    """Load a TUM-format RGB-D sequence directory into aligned per-frame
    lists (images, depths, poses, intrinsics, tstamps), keeping every 5th
    associated frame (reference rgbd_utils.py:35-88 behavior)."""
    pose_file = _first_existing(datapath, ("groundtruth.txt", "pose.txt"))
    if pose_file is None:
        return None, None, None, None, None

    rgb_tab = parse_list(osp.join(datapath, "rgb.txt"))
    dep_tab = parse_list(osp.join(datapath, "depth.txt"))
    pose_tab = parse_list(pose_file, skiprows=1)

    t_img = rgb_tab[:, 0].astype(np.float64)
    t_dep = dep_tab[:, 0].astype(np.float64)
    t_pose = pose_tab[:, 0].astype(np.float64)

    assoc = np.array(associate_frames(t_img, t_dep, t_pose), np.int64)
    assoc = assoc[::5]
    if assoc.size == 0:
        return [], [], [], [], []
    i_img, i_dep, i_pose = assoc.T

    calib = _first_existing(datapath, ("calibration.txt",))
    if calib is not None:
        k = np.loadtxt(calib, delimiter=" ").astype(np.float64)
        intrinsics = [k] * len(assoc)
    else:
        intrinsics = []

    images = [osp.join(datapath, str(f)) for f in rgb_tab[i_img, 1]]
    depths = [osp.join(datapath, str(f)) for f in dep_tab[i_dep, 1]]
    poses = list(pose_tab[i_pose, 1:].astype(np.float64))
    tstamps = list(t_img[i_img])
    return images, depths, poses, intrinsics, tstamps


def all_pairs_distance_matrix(poses, beta=2.5):
    """rgbd_utils.py:91-98: SE3 geodesic distance with scaled translation."""
    poses = np.array(poses, dtype=np.float32)
    poses[:, :3] *= beta
    P = jnp.asarray(poses)
    rel = se3.mul(se3.inv(P[:, None, :]), P[None, :, :])
    return np.asarray(jnp.linalg.norm(se3.log(rel), axis=-1))


def pose_matrix_to_quaternion(pose):
    from scipy.spatial.transform import Rotation
    q = Rotation.from_matrix(pose[:3, :3]).as_quat()
    return np.concatenate([pose[:3, 3], q], axis=0)


def compute_distance_matrix_flow(poses, disps, intrinsics):
    """rgbd_utils.py:105-142: mean induced-flow magnitude between all pairs
    (inf where <70%% covisible). poses are c2w [N,7] numpy; inverted here."""
    poses_w2c = se3.inv(jnp.asarray(poses, jnp.float32))
    disps = jnp.asarray(disps, jnp.float32)
    intr = jnp.asarray(intrinsics, jnp.float32)

    N = poses_w2c.shape[0]
    ii, jj = np.meshgrid(np.arange(N), np.arange(N), indexing="ij")
    ii = ii.reshape(-1)
    jj = jj.reshape(-1)

    MAX_FLOW = 100.0
    matrix = np.zeros((N, N), np.float32)
    s = 2048
    for i in range(0, len(ii), s):
        i1 = jnp.asarray(ii[i:i + s])
        j1 = jnp.asarray(jj[i:i + s])
        flow1, val1 = pops.induced_flow(poses_w2c, disps, intr, i1, j1)
        flow2, val2 = pops.induced_flow(poses_w2c, disps, intr, j1, i1)
        flow = jnp.stack([flow1, flow2], axis=1)
        val = jnp.stack([val1, val2], axis=1)
        mag = jnp.clip(jnp.linalg.norm(flow, axis=-1), max=MAX_FLOW)
        mag = mag.reshape(mag.shape[0], -1)
        val = val.reshape(val.shape[0], -1)
        vmean = jnp.mean(val, -1)
        m = jnp.sum(mag * val[..., :], -1) / jnp.maximum(
            jnp.sum(val, -1), 1e-8)
        m = jnp.where(vmean < 0.7, jnp.inf, m)
        matrix[ii[i:i + s], jj[i:i + s]] = np.asarray(m)
    return matrix
