"""DepthVideo: fixed-capacity keyframe state buffers on device.

TPU recast of /root/reference/droid_slam/depth_video.py. The reference keeps
shared-memory CUDA tensors mutated in place under a multiprocessing lock; here
the state is a pytree of device arrays updated functionally through jitted
static-shape kernels (XLA donates buffers, so updates are in-place on device).
The keyframe counter and cross-thread coordination live on the host (threads
share the Python object; a threading.Lock guards counter mutations, mirroring
the mp.Value lock of the reference).

Buffers (capacity B, feature resolution h=ht//8, w=wd//8):
  tstamp [B]          poses [B,7] (w2c, [t,q])   disps [B,h,w] (inverse depth)
  disps_sens [B,h,w]  disps_up [B,ht,wd]         intrinsics [B,4] (1/8 scale)
  fmaps [B,c,h,w,128] bf16   nets/inps [B,h,w,128] bf16
  damping [B,h,w] (per-pixel BA damping, factor_graph.py:38)

Layout note: feature maps are NHWC (channel-last) for MXU-friendly convs; the
reference uses NCHW fp16 (depth_video.py:36-38).
"""

from __future__ import annotations

import threading
from functools import partial
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..geom import distance as gdist
from ..geom import projective as pops
from ..lie import se3
from ..ba import inference as ba_inf


class VideoBuffers(NamedTuple):
    tstamp: jnp.ndarray
    poses: jnp.ndarray
    disps: jnp.ndarray
    disps_sens: jnp.ndarray
    disps_up: jnp.ndarray
    intrinsics: jnp.ndarray
    fmaps: jnp.ndarray
    nets: jnp.ndarray
    inps: jnp.ndarray
    damping: jnp.ndarray


def _write_frame_traced(buf: VideoBuffers, index, values: dict,
                        fields: tuple):
    """Write one keyframe's fields (an out-of-range `index` drops every
    write). `fields` is the static compile key."""
    upd = {}
    for name in fields:
        arr = getattr(buf, name)
        upd[name] = arr.at[index].set(values[name].astype(arr.dtype))
    return buf._replace(**upd)


_write_frame = jax.jit(_write_frame_traced, static_argnames=("fields",),
                       donate_argnames=("buf",))


@partial(jax.jit, donate_argnames=("buf",))
def _shift_down(buf: VideoBuffers, ix, t):
    """Remove keyframe ix by shifting [ix+1, t) down one slot
    (factor_graph.py:182-196)."""
    B = buf.poses.shape[0]
    ar = jnp.arange(B)
    src = jnp.where((ar >= ix) & (ar < t - 1), ar + 1, ar)

    def shift(x):
        return x[src]

    return VideoBuffers(*[shift(x) for x in buf])


@partial(jax.jit, donate_argnames=("buf",))
def _normalize(buf: VideoBuffers, t):
    """Rescale mean disparity to 1 (depth_video.py:161-168)."""
    B = buf.disps.shape[0]
    mask = (jnp.arange(B) < t)[:, None, None]
    s = jnp.sum(buf.disps * mask) / (jnp.sum(mask) * buf.disps.shape[1]
                                     * buf.disps.shape[2])
    disps = jnp.where(mask, buf.disps / s, buf.disps)
    poses = buf.poses.at[:, :3].multiply(
        jnp.where(jnp.arange(B)[:, None] < t, s, 1.0))
    return buf._replace(disps=disps, poses=poses)


class DepthVideo:
    """Host wrapper owning the device buffers + keyframe counter."""

    def __init__(self, image_size=(480, 640), buffer: int = 512,
                 stereo: bool = False, device=None):
        """device: optional jax.Device pinning this video's buffers (the
        frontend/backend two-device split of droid_async.py:142-159)."""
        ht, wd = image_size
        self.ht, self.wd = ht, wd
        self.h, self.w = ht // 8, wd // 8
        self.buffer = buffer
        self.stereo = stereo
        c = 2 if stereo else 1

        h, w = self.h, self.w
        f32, bf16 = jnp.float32, jnp.bfloat16
        self.buf = VideoBuffers(
            tstamp=jnp.zeros((buffer,), f32),
            poses=jnp.broadcast_to(se3.identity((), f32),
                                   (buffer, 7)).copy(),
            disps=jnp.ones((buffer, h, w), f32),
            disps_sens=jnp.zeros((buffer, h, w), f32),
            disps_up=jnp.zeros((buffer, ht, wd), f32),
            intrinsics=jnp.zeros((buffer, 4), f32),
            fmaps=jnp.zeros((buffer, c, h, w, 128), bf16),
            nets=jnp.zeros((buffer, h, w, 128), bf16),
            inps=jnp.zeros((buffer, h, w, 128), bf16),
            damping=1e-6 * jnp.ones((buffer, h, w), f32),
        )
        if device is not None:
            self.buf = jax.device_put(self.buf, device)
        self.device = device
        self.counter = 0
        self.ready = False
        self.dirty = np.zeros(buffer, bool)
        self.images = [None] * buffer  # host-side (vis / export only)
        self._lock = threading.RLock()

    def get_lock(self):
        return self._lock

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    def append(self, tstamp, image=None, pose=None, disp=None, depth=None,
               intrinsics=None, fmap=None, net=None, inp=None, defer=False):
        with self._lock:
            return self.set_frame(self.counter, tstamp, image, pose, disp,
                                  depth, intrinsics, fmap, net, inp,
                                  defer=defer)

    def set_frame(self, index, tstamp, image=None, pose=None, disp=None,
                  depth=None, intrinsics=None, fmap=None, net=None, inp=None,
                  defer=False):
        """depth_video.py:78-109 semantics; `depth` is a full-res depth map
        subsampled [3::8, 3::8] to inverse depth. All provided fields are
        written in ONE fused dispatch — or, with `defer`, returned as
        (index, values, fields) for a caller that folds the write into a
        larger program (the single-dispatch frame path)."""
        if index >= self.buffer:
            raise RuntimeError(
                f"DepthVideo buffer full: keyframe index {index} >= "
                f"buffer {self.buffer}. Raise --buffer (reference uses "
                f"512-1024 per dataset, SURVEY.md §2.4) or raise "
                f"filter_thresh to admit fewer keyframes.")
        if image is not None:
            self.images[index] = np.asarray(image)

        values = {"tstamp": jnp.asarray(tstamp, jnp.float32)}
        if pose is not None:
            values["poses"] = jnp.asarray(pose)
        if disp is not None:
            values["disps"] = jnp.broadcast_to(
                jnp.asarray(disp, jnp.float32), (self.h, self.w))
        if depth is not None:
            dep = np.asarray(depth, np.float32)[3::8, 3::8]
            ds = np.where(dep > 0, 1.0 / np.where(dep > 0, dep, 1.0), 0.0)
            values["disps_sens"] = jnp.asarray(ds)
        if intrinsics is not None:
            values["intrinsics"] = jnp.asarray(intrinsics, jnp.float32)
        if fmap is not None:
            values["fmaps"] = jnp.asarray(fmap, jnp.bfloat16)
        if net is not None:
            values["nets"] = jnp.asarray(net, jnp.bfloat16)
        if inp is not None:
            values["inps"] = jnp.asarray(inp, jnp.bfloat16)

        fields = tuple(sorted(values))
        if index >= self.counter:
            self.counter = index + 1
        self.dirty[index] = True
        if defer:
            return index, values, fields
        self.buf = _write_frame(self.buf, jnp.asarray(index), values, fields)

    def apply_write(self, wf):
        """Eagerly dispatch a deferred (index, values, fields) frame write
        (fallback of the single-dispatch frame path)."""
        if wf is None:
            return
        index, values, fields = wf
        self.buf = _write_frame(self.buf, jnp.asarray(index), values, fields)

    def rm_keyframe(self, ix: int):
        with self._lock:
            self.buf = _shift_down(self.buf, jnp.asarray(ix),
                                   jnp.asarray(self.counter))

    def normalize(self):
        """Mono scale normalization at backend entry (depth_video.py:161-168)."""
        with self._lock:
            self.buf = _normalize(self.buf, jnp.asarray(self.counter))
            self.dirty[:self.counter] = True

    # ------------------------------------------------------------------
    # geometric ops
    # ------------------------------------------------------------------

    def reproject(self, ii, jj):
        """depth_video.py:171-179. Edge count is padded to a bucket so the
        jitted transform compiles once per bucket, not per call."""
        ii = np.atleast_1d(np.asarray(ii))
        jj = np.atleast_1d(np.asarray(jj))
        n = len(ii)
        nb = _edge_bucket(n)
        ii_p = np.zeros(nb, np.int64); ii_p[:n] = ii
        jj_p = np.zeros(nb, np.int64); jj_p[:n] = jj
        coords, valid = _reproject_jit(
            self.buf.poses, self.buf.disps, self.buf.intrinsics,
            jnp.asarray(ii_p), jnp.asarray(jj_p))
        return coords[:n], valid[:n]

    # max pairs per frame_distance dispatch: each directed warp materializes
    # [E,h,w,4] point clouds (~[E,2560,4] f32), so a global-BA proposal over
    # all t^2 pairs at t~1000 (1M pairs, droid_backend.py:33-39) must be
    # chunked or it allocates TBs. 32768 pairs ~= 1.3 GB per warp buffer.
    _DIST_CHUNK = 32768

    def distance(self, ii, jj, beta=0.3, bidirectional=True):
        """depth_video.py:181-211 (edge count bucketed; large pair sets are
        processed in fixed-size chunks to bound device memory)."""
        ii = np.atleast_1d(np.asarray(ii))
        jj = np.atleast_1d(np.asarray(jj))
        n = len(ii)
        if n > self._DIST_CHUNK:
            out = np.empty(n, np.float32)
            for s in range(0, n, self._DIST_CHUNK):
                e = min(s + self._DIST_CHUNK, n)
                out[s:e] = np.asarray(
                    self.distance(ii[s:e], jj[s:e], beta=beta,
                                  bidirectional=bidirectional))
            return out
        nb = _edge_bucket(n)
        ii_p = np.zeros(nb, np.int64); ii_p[:n] = ii
        jj_p = np.zeros(nb, np.int64); jj_p[:n] = jj
        d = gdist.frame_distance_jit(
            self.buf.poses, self.buf.disps, self.buf.intrinsics[0],
            jnp.asarray(ii_p), jnp.asarray(jj_p), beta,
            bidirectional=bidirectional)
        return d[:n]

    def distance_matrix(self, beta=0.3):
        """All-pairs distance over current keyframes (returns [t,t] numpy)."""
        t = self.counter
        ii, jj = np.meshgrid(np.arange(t), np.arange(t), indexing="ij")
        d = self.distance(ii.reshape(-1), jj.reshape(-1), beta=beta)
        return np.asarray(d).reshape(t, t)

    def ba(self, target, weight, ii, jj, t0=1, t1=None, itrs=2, lm=1e-4,
           ep=0.1, motion_only=False):
        """Dense bundle adjustment over the given edge set
        (depth_video.py:213-226). target/weight are [E,2,HW] device arrays
        aligned with ii/jj (may include padding; pass edge lists unpadded)."""
        if t1 is None:
            t1 = int(max(ii.max(), jj.max())) + 1
        shape, plan = ba_inf.build_plan(np.asarray(ii), np.asarray(jj),
                                        int(t0), int(t1), iters=itrs,
                                        motion_only=motion_only)
        E = shape.edges
        tgt = _pad_to(target, E)
        wgt = _pad_to(weight, E)
        with self._lock:
            poses, disps = ba_inf.ba_windowed(
                shape, self.buf.poses, self.buf.disps, self.buf.disps_sens,
                self.buf.damping, self.buf.intrinsics[0], tgt, wgt, plan,
                lm, ep)
            self.buf = self.buf._replace(poses=poses, disps=disps)

    def update_damping(self, frames, eta):
        """Scatter per-frame damping maps (factor_graph.py:238)."""
        idx = jnp.asarray(frames)
        self.buf = self.buf._replace(
            damping=self.buf.damping.at[idx].set(eta.astype(jnp.float32)))

    def set_disps_up(self, frames, disps_up):
        idx = jnp.asarray(frames)
        self.buf = self.buf._replace(
            disps_up=self.buf.disps_up.at[idx].set(disps_up))

    # convenience accessors -------------------------------------------------
    @property
    def poses(self):
        return self.buf.poses

    @property
    def disps(self):
        return self.buf.disps


def _pad_to(x, n):
    pad = n - x.shape[0]
    if pad <= 0:
        return x[:n]
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


_EDGE_BUCKETS = (8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192,
                 16384, 32768, 65536, 262144, 1048576)


def _edge_bucket(n: int) -> int:
    for b in _EDGE_BUCKETS:
        if n <= b:
            return b
    return n


@jax.jit
def _reproject_jit(poses, disps, intrinsics, ii, jj):
    coords, valid, _ = pops.projective_transform(poses, disps, intrinsics,
                                                 ii, jj)
    return coords, valid
