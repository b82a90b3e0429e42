"""DroidAsync: concurrent frontend/backend SLAM.

Parity with /root/reference/droid_slam/droid_async.py:19-215. The reference
spawns a torch.multiprocessing process sharing CUDA tensors; here the backend
runs in a daemon thread with its own DepthVideo (optionally on a second TPU
device) — JAX releases the GIL during device execution, so frontend tracking
and global BA overlap. The state-exchange protocol is preserved: once the
frontend has >32 keyframes, the backend periodically (sleep 10s) snapshots the
frontend video under its lock, aligns the fragments (scale + SE3 mean), copies
the [t0,t1) slice, and runs the persistent-graph global BA; a `ready` flag
handshake drives the final iteration at terminate().
"""

from __future__ import annotations

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DroidConfig
from ..lie import se3
from ..models import nets, weights as weights_io
from ..state.video import DepthVideo
from .align import align_pose_fragments
from .backend import DroidAsyncBackend
from .droid import TrackPipeline
from .frontend import DroidFrontend
from .motion_filter import MotionFilter
from .trajectory_filler import PoseTrajectoryFiller


class DroidAsync(TrackPipeline):
    def __init__(self, config: DroidConfig, sleep_time: float = 10.0,
                 backend_iters: int = 8):
        self.config = config
        self.params = (weights_io.load(config.weights) if config.weights
                       else nets.init_params(jax.random.PRNGKey(0)))
        self._fused_frame = self._fused_frame_default()
        self._spec_frame = self._fused_frame and self._spec_frame_default()
        self._spec_meta = None

        # frontend/backend on separate devices when available
        # (droid_async.py:142-159 --frontend_device/--backend_device)
        devs = jax.devices()
        front_dev = devs[0]
        back_dev = devs[1] if len(devs) > 1 else devs[0]
        self.video = DepthVideo(config.image_size, config.buffer,
                                stereo=config.stereo, device=front_dev)
        self.video2 = DepthVideo(config.image_size, config.buffer,
                                 stereo=config.stereo, device=back_dev)
        self.filterx = MotionFilter(self.params, self.video,
                                    thresh=config.filter_thresh)
        self.frontend = DroidFrontend(self.params, self.video, config)
        # speculative proximity-distance plumbing (one sync per frame)
        self.frontend.motion_filter = self.filterx
        self.filterx.proximity_probe = self.frontend.proximity_pairs
        self.backend = DroidAsyncBackend(self.params, self.video2, config)
        self.traj_filler = PoseTrajectoryFiller(self.params, self.video2)

        self.sleep_time = sleep_time
        self.backend_iters = backend_iters
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._backend_loop,
                                        daemon=True)
        self._thread.start()

    # ------------------------------------------------------------------

    def _sync_and_run_backend(self, is_last: bool):
        """droid_async.py:58-125: fragment alignment + slice copy + BA."""
        v1, v2 = self.video, self.video2

        t0 = max(v2.counter - 2, 0)
        t1 = v1.counter if is_last else v1.counter - 5
        if t1 <= t0:
            return

        # Snapshot EVERY frontend field this sync reads while holding v1's
        # lock: the frontend's frame programs donate v1.buf (droid.py), which
        # deletes the old array handles at dispatch time — any v1.buf access
        # outside the lock races with that deletion ("Array has been
        # deleted"). Same-device `src` arrays are the live buffers, so the
        # reads are dispatched (as copies) before the lock is released.
        with v1.get_lock():
            src = v1.buf
            if v2.device is not None and v2.device != v1.device:
                # explicit cross-device copy (droid_async.py:74-119 .to())
                src = jax.device_put(src, v2.device)
            has_sens = jnp.any(src.disps_sens)
            poses1 = src.poses + 0
            disps1 = src.disps + 0
            sl = slice(t0, t1)
            sens_sl = src.disps_sens[sl] + 0
            tstamp_sl = src.tstamp[sl] + 0
            intr_sl = src.intrinsics[sl] + 0
            fmaps_sl = src.fmaps[sl] + 0
            nets_sl = src.nets[sl] + 0
            inps_sl = src.inps[sl] + 0
            images_sl = list(self.video.images[t0:t1])
        align_scale = not v2.stereo and not bool(has_sens)

        if t0 > 0:
            lo = max(t0 - 10, 0)
            dP, s = align_pose_fragments(poses1[lo:t0 - 1],
                                         v2.buf.poses[lo:t0 - 1])
            if not align_scale:
                s = jnp.asarray(1.0)
            poses1 = poses1.at[..., :3].multiply(s)
        else:
            s = jnp.asarray(1.0)
            dP = se3.identity((1,))

        b2 = v2.buf._replace(
            poses=v2.buf.poses.at[sl].set(se3.mul(dP, poses1[sl])),
            disps=v2.buf.disps.at[sl].set(disps1[sl] / s),
            disps_sens=v2.buf.disps_sens.at[sl].set(sens_sl),
            tstamp=v2.buf.tstamp.at[sl].set(tstamp_sl),
            intrinsics=v2.buf.intrinsics.at[sl].set(intr_sl),
            fmaps=v2.buf.fmaps.at[sl].set(fmaps_sl),
            nets=v2.buf.nets.at[sl].set(nets_sl),
            inps=v2.buf.inps.at[sl].set(inps_sl),
        )
        with v2.get_lock():
            v2.buf = b2
            v2.counter = t1
            v2.images[t0:t1] = images_sl

        self.backend(self.backend_iters, normalize=False)

    def _backend_loop(self):
        while not self._stop.is_set():
            if self.video.counter > 32 or self.video2.ready:
                is_last = self.video2.ready
                self._sync_and_run_backend(is_last)
                if is_last:
                    return
            self._stop.wait(self.sleep_time)

    # ------------------------------------------------------------------

    # track() inherited from TrackPipeline (incl. the single-dispatch
    # steady-state frame program)

    def terminate(self, stream=None, backend_steps=None):
        """droid_async.py:200-215. ``backend_steps`` is accepted for
        facade-compatibility with Droid and ignored: the async backend owns
        its iteration schedule (8 same-device / 12 split, backend_iters)."""
        self.flush()
        self.video2.ready = True
        self._thread.join(timeout=600)
        self._stop.set()

        if stream is not None:
            traj = self.traj_filler(stream)
        else:
            traj = np.asarray(self.video2.buf.poses[:self.video2.counter])
        return np.asarray(se3.inv(se3.normalize(jnp.asarray(traj))))
