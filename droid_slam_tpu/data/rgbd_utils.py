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


def associate_frames(tstamp_image, tstamp_depth, tstamp_pose, max_dt=1.0):
    """rgbd_utils.py:16-33."""
    associations = []
    for i, t in enumerate(tstamp_image):
        if tstamp_pose is None:
            j = np.argmin(np.abs(tstamp_depth - t))
            if np.abs(tstamp_depth[j] - t) < max_dt:
                associations.append((i, j))
        else:
            j = np.argmin(np.abs(tstamp_depth - t))
            k = np.argmin(np.abs(tstamp_pose - t))
            if (np.abs(tstamp_depth[j] - t) < max_dt
                    and np.abs(tstamp_pose[k] - t) < max_dt):
                associations.append((i, j, k))
    return associations


def loadtum(datapath, frame_rate=-1):
    """rgbd_utils.py:35-88: returns (images, depths, poses, intrinsics,
    tstamps) with every 5th associated frame."""
    if osp.isfile(osp.join(datapath, "groundtruth.txt")):
        pose_list = osp.join(datapath, "groundtruth.txt")
    elif osp.isfile(osp.join(datapath, "pose.txt")):
        pose_list = osp.join(datapath, "pose.txt")
    else:
        return None, None, None, None, None

    image_list = osp.join(datapath, "rgb.txt")
    depth_list = osp.join(datapath, "depth.txt")

    calib_path = osp.join(datapath, "calibration.txt")
    intrinsic = None
    if osp.isfile(calib_path):
        intrinsic = np.loadtxt(calib_path, delimiter=" ").astype(np.float64)

    image_data = parse_list(image_list)
    depth_data = parse_list(depth_list)
    pose_data = parse_list(pose_list, skiprows=1)
    pose_vecs = pose_data[:, 1:].astype(np.float64)

    tstamp_image = image_data[:, 0].astype(np.float64)
    tstamp_depth = depth_data[:, 0].astype(np.float64)
    tstamp_pose = pose_data[:, 0].astype(np.float64)
    associations = associate_frames(tstamp_image, tstamp_depth, tstamp_pose)

    indices = range(len(associations))[::5]

    images, poses, depths, intrinsics, tstamps = [], [], [], [], []
    for ix in indices:
        i, j, k = associations[ix]
        images.append(osp.join(datapath, str(image_data[i, 1])))
        depths.append(osp.join(datapath, str(depth_data[j, 1])))
        poses.append(pose_vecs[k])
        tstamps.append(tstamp_image[i])
        if intrinsic is not None:
            intrinsics.append(intrinsic)
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
