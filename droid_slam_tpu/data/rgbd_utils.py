"""Dataset utilities: TUM-format loading, timestamp association, all-pairs
flow-distance matrices for covisibility graphs.

Parity with /root/reference/droid_slam/data_readers/rgbd_utils.py, with the
flow computation running through our JAX geometry instead of lietorch.
"""

from __future__ import annotations

import os.path as osp

import numpy as np
import jax
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


# behavior constants of the reference metric (rgbd_utils.py:121-136):
# per-pixel flow saturates at MAX_FLOW px and a pair counts as covisible
# only when >= MIN_COVIS of pixels reproject validly (both directions
# pooled); non-covisible pairs score inf.
MAX_FLOW = 100.0
MIN_COVIS = 0.7


def _flow_row(poses_w2c, disps, intr, i):
    """Symmetric mean-flow distances from frame i to every frame [N]."""
    jj = jnp.arange(poses_w2c.shape[0])
    ii = jnp.full_like(jj, i)
    num = jnp.zeros(jj.shape, disps.dtype)
    den = jnp.zeros(jj.shape, disps.dtype)
    for a, b in ((ii, jj), (jj, ii)):  # bidirectional, pooled
        flow, val = pops.induced_flow(poses_w2c, disps, intr, a, b)
        mag = jnp.minimum(jnp.linalg.norm(flow, axis=-1), MAX_FLOW)
        val = val.reshape(val.shape[0], -1)  # [N, H*W] ( [..,1] squeezed)
        num += jnp.sum(mag.reshape(mag.shape[0], -1) * val, axis=-1)
        den += jnp.sum(val, axis=-1)
    covis = den / (2.0 * disps.shape[-2] * disps.shape[-1])
    mean = num / jnp.maximum(den, 1e-8)
    return jnp.where(covis < MIN_COVIS, jnp.inf, mean)


@jax.jit
def _flow_matrix(poses_w2c, disps, intr):
    # one row of the N x N matrix per map step: peak memory O(N*HW), the
    # whole matrix in one jit dispatch (no host chunk loop)
    return jax.lax.map(
        lambda i: _flow_row(poses_w2c, disps, intr, i),
        jnp.arange(poses_w2c.shape[0]))


def compute_distance_matrix_flow(poses, disps, intrinsics):
    """Mean induced-flow magnitude between all frame pairs [N,N]
    (reference metric: rgbd_utils.py:105-142). poses are c2w [N,7] numpy;
    inverted to w2c here. Used offline for covisibility indexing (results
    are pickled by data/base.py), so the per-N jit compile is paid once
    per scene shape."""
    poses_w2c = se3.inv(jnp.asarray(poses, jnp.float32))
    # np.array (not asarray): callers mutate the matrix (graph_utils.py)
    return np.array(_flow_matrix(poses_w2c,
                                 jnp.asarray(disps, jnp.float32),
                                 jnp.asarray(intrinsics, jnp.float32)))
