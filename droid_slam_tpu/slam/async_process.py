"""DroidAsyncProcess: frontend/backend SLAM in SEPARATE OS processes.

Process-isolation parity with /root/reference/droid_slam/droid_async.py:
168-186, where the backend is a spawned torch.multiprocessing Process and
the DepthVideo state is exchanged through share_memory_() CUDA tensors
guarded by an mp.Lock (depth_video.py:16-38). The TPU-native equivalent
exchanges state through POSIX shared memory (multiprocessing.shared_memory)
in host RAM:

  * the frontend process owns its accelerator and a pusher thread that
    periodically snapshots the tracking DepthVideo under its lock
    (device->host copies of the NEW keyframe slice + full poses/disps,
    mirroring droid_async.py:73-119's slice copy) into the shared slab;
  * the backend process (own JAX runtime, platform from
    ``backend_platform`` — a second chip in a 2-chip deployment, CPU here)
    polls the slab counter, copies the slab into its own DepthVideo,
    aligns the pose fragments (scale + SE3 mean, slam/align.py), runs the
    persistent-graph global BA (DroidAsyncBackend), and publishes its
    optimized poses/disps back through an output slab;
  * a `ready` flag drives the final iteration at terminate(), after which
    the parent reconstructs the backend video from the slabs for the
    trajectory filler.

bfloat16 fields travel as uint16 bit patterns (shared_memory has no dtype;
ml_dtypes.bfloat16 round-trips exactly).

The thread-based variant (slam/async_droid.py) remains the default: on a
single-chip single-core host it measures ~2.4% overhead and shares every
compile. This module is the faithful process-isolated architecture for
hosts where the backend deserves its own interpreter/GIL and device.
"""

from __future__ import annotations

import multiprocessing as mp
import threading
import time
from multiprocessing import shared_memory

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes

from ..config import DroidConfig
from ..lie import se3
from ..models import nets, weights as weights_io
from ..state.video import DepthVideo
from .droid import TrackPipeline
from .frontend import DroidFrontend
from .motion_filter import MotionFilter
from .trajectory_filler import PoseTrajectoryFiller

BF16 = ml_dtypes.bfloat16


def _slab_fields(B, c, h, w):
    """(name, shape, dtype) of every shared field. bf16 -> uint16 bits."""
    return [
        ("tstamp", (B,), np.float32),
        ("poses", (B, 7), np.float32),
        ("disps", (B, h, w), np.float32),
        ("disps_sens", (B, h, w), np.float32),
        ("intrinsics", (B, 4), np.float32),
        ("fmaps", (B, c, h, w, 128), np.uint16),
        ("nets", (B, h, w, 128), np.uint16),
        ("inps", (B, h, w, 128), np.uint16),
        # backend results
        ("out_poses", (B, 7), np.float32),
        ("out_disps", (B, h, w), np.float32),
    ]


class _Slab:
    """Named shared-memory block with numpy views per field."""

    def __init__(self, fields, name=None, create=False):
        self.fields = fields
        total = sum(int(np.prod(s)) * np.dtype(d).itemsize
                    for _, s, d in fields)
        self.shm = shared_memory.SharedMemory(
            name=name, create=create, size=total)
        self.views = {}
        off = 0
        for fname, shape, dtype in fields:
            n = int(np.prod(shape)) * np.dtype(dtype).itemsize
            self.views[fname] = np.frombuffer(
                self.shm.buf, dtype=dtype, count=int(np.prod(shape)),
                offset=off).reshape(shape)
            off += n

    def close(self, unlink=False):
        self.views = {}
        try:
            self.shm.close()
            if unlink:
                self.shm.unlink()
        except Exception:
            pass


def _to_bits(x):
    a = np.asarray(x)
    return a.view(np.uint16) if a.dtype == BF16 else a


def _backend_main(shm_name, fields, cfg_dict, params_np, ctl,
                  backend_platform, sleep_time, backend_iters):
    """Backend process entry (spawned): own JAX runtime on its own
    platform; poll -> copy -> align -> global BA -> publish."""
    import os
    os.environ["JAX_PLATFORM_NAME"] = backend_platform
    os.environ["JAX_PLATFORMS"] = backend_platform
    import jax as bjax
    try:
        bjax.config.update("jax_platforms", backend_platform)
    except Exception:
        pass
    import jax.numpy as bjnp

    from droid_slam_tpu.config import DroidConfig
    from droid_slam_tpu.lie import se3 as bse3
    from droid_slam_tpu.slam.align import align_pose_fragments
    from droid_slam_tpu.slam.backend import DroidAsyncBackend
    from droid_slam_tpu.state.video import DepthVideo

    cfg = DroidConfig(**cfg_dict)
    params = {k: bjnp.asarray(v) for k, v in params_np.items()}
    slab = _Slab(fields, name=shm_name, create=False)
    v2 = DepthVideo(cfg.image_size, cfg.buffer, stereo=cfg.stereo)
    backend = DroidAsyncBackend(params, v2, cfg)

    def publish():
        with ctl["out_lock"]:
            slab.views["out_poses"][:] = np.asarray(v2.buf.poses)
            slab.views["out_disps"][:] = np.asarray(v2.buf.disps)
            ctl["counter_out"].value = v2.counter

    try:
        while True:
            is_last = ctl["ready"].value == 1
            t_in = ctl["counter_in"].value
            if t_in > 32 or is_last:
                t0 = max(v2.counter - 2, 0)
                t1 = t_in if is_last else t_in - 5
                if t1 > t0:
                    with ctl["in_lock"]:
                        poses1 = slab.views["poses"].copy()
                        disps1 = slab.views["disps"].copy()
                        sl = slice(t0, t1)
                        sens_sl = slab.views["disps_sens"][sl].copy()
                        tstamp_sl = slab.views["tstamp"][sl].copy()
                        intr_sl = slab.views["intrinsics"][sl].copy()
                        fmaps_sl = slab.views["fmaps"][sl].copy()
                        nets_sl = slab.views["nets"][sl].copy()
                        inps_sl = slab.views["inps"][sl].copy()
                    poses1 = bjnp.asarray(poses1)
                    disps1 = bjnp.asarray(disps1)
                    align_scale = (not cfg.stereo
                                   and not bool(np.any(sens_sl)))
                    if t0 > 0:
                        lo = max(t0 - 10, 0)
                        dP, s = align_pose_fragments(
                            poses1[lo:t0 - 1], v2.buf.poses[lo:t0 - 1])
                        if not align_scale:
                            s = bjnp.asarray(1.0)
                        poses1 = poses1.at[..., :3].multiply(s)
                    else:
                        s = bjnp.asarray(1.0)
                        dP = bse3.identity((1,))
                    bb = v2.buf._replace(
                        poses=v2.buf.poses.at[sl].set(
                            bse3.mul(dP, poses1[sl])),
                        disps=v2.buf.disps.at[sl].set(disps1[sl] / s),
                        disps_sens=v2.buf.disps_sens.at[sl].set(
                            bjnp.asarray(sens_sl)),
                        tstamp=v2.buf.tstamp.at[sl].set(
                            bjnp.asarray(tstamp_sl)),
                        intrinsics=v2.buf.intrinsics.at[sl].set(
                            bjnp.asarray(intr_sl)),
                        fmaps=v2.buf.fmaps.at[sl].set(
                            bjnp.asarray(fmaps_sl.view(BF16))),
                        nets=v2.buf.nets.at[sl].set(
                            bjnp.asarray(nets_sl.view(BF16))),
                        inps=v2.buf.inps.at[sl].set(
                            bjnp.asarray(inps_sl.view(BF16))),
                    )
                    v2.buf = bb
                    v2.counter = t1
                    backend(backend_iters, normalize=False)
                    publish()
                    ctl["cycles"].value += 1
                if is_last:
                    publish()
                    ctl["done"].value = 1
                    return
            if ctl["stop"].value:
                return
            time.sleep(sleep_time)
    finally:
        slab.close()


class DroidAsyncProcess(TrackPipeline):
    """Same facade as DroidAsync; backend in a spawned OS process."""

    def __init__(self, config: DroidConfig, sleep_time: float = 10.0,
                 backend_iters: int = 8, backend_platform: str = "cpu",
                 push_time: float | None = None):
        self.config = config
        self.params = (weights_io.load(config.weights) if config.weights
                       else nets.init_params(jax.random.PRNGKey(0)))
        self._fused_frame = self._fused_frame_default()
        self._spec_frame = self._fused_frame and self._spec_frame_default()
        self._spec_meta = None

        self.video = DepthVideo(config.image_size, config.buffer,
                                stereo=config.stereo)
        self.filterx = MotionFilter(self.params, self.video,
                                    thresh=config.filter_thresh)
        self.frontend = DroidFrontend(self.params, self.video, config)
        self.frontend.motion_filter = self.filterx
        self.filterx.proximity_probe = self.frontend.proximity_pairs

        B = config.buffer
        h, w = self.video.h, self.video.w
        c = self.video.buf.fmaps.shape[1]
        self._fields = _slab_fields(B, c, h, w)
        self._slab = _Slab(self._fields, create=True)

        ctx = mp.get_context("spawn")
        self._ctl = {
            "counter_in": ctx.Value("i", 0),
            "counter_out": ctx.Value("i", 0),
            "ready": ctx.Value("i", 0),
            "stop": ctx.Value("i", 0),
            "done": ctx.Value("i", 0),
            "cycles": ctx.Value("i", 0),
            "in_lock": ctx.Lock(),
            "out_lock": ctx.Lock(),
        }
        params_np = {k: np.asarray(v) for k, v in self.params.items()}
        import dataclasses
        self._proc = ctx.Process(
            target=_backend_main,
            args=(self._slab.shm.name, self._fields,
                  dataclasses.asdict(config), params_np, self._ctl,
                  backend_platform, sleep_time, backend_iters),
            daemon=True)
        self._proc.start()

        self.sleep_time = sleep_time
        self._pushed = 0
        self._push_stop = threading.Event()
        self._push_thread = threading.Thread(
            target=self._push_loop,
            args=(push_time if push_time is not None else sleep_time,),
            daemon=True)
        self._push_thread.start()

    # ------------------------------------------------------------------

    def _push(self):
        """Snapshot the tracking video into the shared slab (the parent
        half of droid_async.py:73-119: full poses/disps refresh + the new
        keyframe slice of the per-frame fields)."""
        v = self.video
        t1 = v.counter
        if t1 == 0:
            return
        with v.get_lock():
            src = v.buf
            poses = np.asarray(src.poses)
            disps = np.asarray(src.disps)
            sl = slice(self._pushed, t1)
            sens_sl = np.asarray(src.disps_sens[sl])
            tstamp_sl = np.asarray(src.tstamp[sl])
            intr_sl = np.asarray(src.intrinsics[sl])
            fmaps_sl = np.asarray(src.fmaps[sl])
            nets_sl = np.asarray(src.nets[sl])
            inps_sl = np.asarray(src.inps[sl])
        with self._ctl["in_lock"]:
            s = self._slab.views
            s["poses"][:] = poses
            s["disps"][:] = disps
            s["disps_sens"][sl] = sens_sl
            s["tstamp"][sl] = tstamp_sl
            s["intrinsics"][sl] = intr_sl
            s["fmaps"][sl] = _to_bits(fmaps_sl)
            s["nets"][sl] = _to_bits(nets_sl)
            s["inps"][sl] = _to_bits(inps_sl)
            self._ctl["counter_in"].value = t1
        self._pushed = t1

    def _push_loop(self, period):
        while not self._push_stop.is_set():
            try:
                self._push()
            except Exception:
                pass
            self._push_stop.wait(period)

    @property
    def backend_cycles(self):
        return self._ctl["cycles"].value

    # ------------------------------------------------------------------

    def terminate(self, stream=None, backend_steps=None, join_timeout=600):
        """droid_async.py:200-215: final handshake, then rebuild the
        backend video from the slabs for the trajectory filler.
        ``backend_steps`` accepted for facade-compatibility, ignored."""
        self.flush()
        self._push_stop.set()
        self._push_thread.join(timeout=60)
        self._push()
        self._ctl["ready"].value = 1
        deadline = time.time() + join_timeout
        while not self._ctl["done"].value and time.time() < deadline:
            if not self._proc.is_alive():
                break
            time.sleep(0.2)
        self._ctl["stop"].value = 1
        self._proc.join(timeout=30)

        t2 = self._ctl["counter_out"].value
        if t2 == 0:
            # backend never ran (short sequence): fall back to frontend
            traj = np.asarray(self.video.buf.poses[:self.video.counter])
            out = np.asarray(se3.inv(se3.normalize(jnp.asarray(traj))))
            self._cleanup()
            return out

        s = self._slab.views
        video2 = DepthVideo(self.config.image_size, self.config.buffer,
                            stereo=self.config.stereo)
        with self._ctl["out_lock"]:
            video2.buf = video2.buf._replace(
                poses=jnp.asarray(s["out_poses"].copy()),
                disps=jnp.asarray(s["out_disps"].copy()),
                disps_sens=jnp.asarray(s["disps_sens"].copy()),
                tstamp=jnp.asarray(s["tstamp"].copy()),
                intrinsics=jnp.asarray(s["intrinsics"].copy()),
                fmaps=jnp.asarray(s["fmaps"].copy().view(BF16)),
                nets=jnp.asarray(s["nets"].copy().view(BF16)),
                inps=jnp.asarray(s["inps"].copy().view(BF16)),
            )
        video2.counter = t2

        if stream is not None:
            filler = PoseTrajectoryFiller(self.params, video2)
            traj = filler(stream)
        else:
            traj = np.asarray(video2.buf.poses[:t2])
        out = np.asarray(se3.inv(se3.normalize(jnp.asarray(traj))))
        self._cleanup()
        return out

    def _cleanup(self):
        self._slab.close(unlink=True)
