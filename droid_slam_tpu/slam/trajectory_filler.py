"""PoseTrajectoryFiller: recover poses for non-keyframe images.

Parity with /root/reference/droid_slam/trajectory_filler.py:19-110 — for each
batch of 16 frames: linear SE3 interpolation between bracketing keyframes,
temporary append into the video, two anchor factors per frame, 6 motion-only
BA iterations, then pop the temporary frames.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..lie import se3
from ..state.graph import FactorGraph
from .motion_filter import _encode_fnet


class PoseTrajectoryFiller:
    def __init__(self, params, video):
        self.params = params
        self.video = video

    def _fill(self, tstamps, images, intrinsics):
        """trajectory_filler.py:42-84."""
        v = self.video
        N = v.counter
        M = len(tstamps)
        buf = v.buf

        ts = np.asarray(buf.tstamp[:N])
        Ps = buf.poses[:N]

        t0 = np.array([max(int(np.sum(ts <= t)) - 1, 0) for t in tstamps])
        t1 = np.where(t0 < N - 1, t0 + 1, t0)

        dt = jnp.asarray(ts[t1] - ts[t0] + 1e-3, jnp.float32)[:, None]
        dP = se3.mul(Ps[jnp.asarray(t1)], se3.inv(Ps[jnp.asarray(t0)]))
        w = se3.log(dP) / dt * jnp.asarray(
            np.asarray(tstamps) - ts[t0], jnp.float32)[:, None]
        Gs = se3.mul(se3.exp(w), Ps[jnp.asarray(t0)])

        # capacity guard: the temporary frames live at slots [N, N+M) — past
        # the buffer they would be silently DROPPED by the padded scatters
        # (garbage poses out). Split the batch to what fits; with a full
        # buffer fall back to the interpolation-only poses (the reference
        # would corrupt/crash here — trajectory_filler.py:66-79 assumes
        # headroom).
        B = buf.poses.shape[0]
        avail = B - N
        if avail <= 0:
            return np.asarray(Gs)
        if M > avail:
            return np.concatenate([
                self._fill(tstamps[:avail], images[:avail],
                           intrinsics[:avail]),
                self._fill(tstamps[avail:], images[avail:],
                           intrinsics[avail:])], axis=0)

        imgs = jnp.asarray(np.stack(images))  # [M,H,W,3] uint8 BGR
        fmaps = _encode_fnet(self.params, imgs)

        with v.get_lock():
            for k in range(M):
                v.set_frame(N + k, tstamps[k], pose=Gs[k], disp=1.0,
                            intrinsics=np.asarray(intrinsics[k]) / 8.0,
                            fmap=fmaps[k:k + 1])
            v.counter = N + M

            graph = FactorGraph(v, self.params)
            graph.add_factors(t0, np.arange(N, N + M))
            graph.add_factors(t1, np.arange(N, N + M))
            graph.update(N, N + M, motion_only=True, n_iters=6)

            out = np.asarray(v.buf.poses[N:N + M])
            v.counter = N
        return out

    def __call__(self, image_stream):
        """image_stream yields (tstamp, image [H,W,3] BGR uint8 or [C,H,W,3],
        intrinsics [4]). Returns [T,7] poses (w2c) for every stream frame."""
        pose_list = []
        tstamps, images, intrinsics = [], [], []
        for item in image_stream:
            tstamp, image, intr = item[0], item[1], item[2]
            image = np.asarray(image)
            if image.ndim == 4:  # stereo stack: left view only
                image = image[0]
            tstamps.append(tstamp)
            images.append(image)
            intrinsics.append(intr)
            if len(tstamps) == 16:
                pose_list.append(self._fill(tstamps, images, intrinsics))
                tstamps, images, intrinsics = [], [], []
        if tstamps:
            pose_list.append(self._fill(tstamps, images, intrinsics))
        return np.concatenate(pose_list, axis=0)
