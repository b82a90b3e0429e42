"""Droid facade: the user-facing SLAM system.

Parity with /root/reference/droid_slam/droid.py:16-86:
  droid = Droid(config); droid.track(t, image, depth, intrinsics) per frame;
  traj = droid.terminate(stream)  ->  [T,7] numpy, camera-to-world [t,q].
"""

from __future__ import annotations

import numpy as np
import jax

from ..config import DroidConfig
from ..lie import se3
from ..models import nets, weights as weights_io
from ..state.video import DepthVideo
from .backend import DroidBackend
from .frontend import DroidFrontend
from .motion_filter import MotionFilter
from .trajectory_filler import PoseTrajectoryFiller


class TrackPipeline:
    """Shared per-frame tracking pipeline (sync Droid + DroidAsync):
    1-frame-deferred decisions with prefetched readbacks, and the
    single-dispatch steady-state frame program. Hosts must provide
    `frontend`, `filterx`, `video`, `params`."""

    @staticmethod
    def _fused_frame_default():
        # single-dispatch steady-state frame path (slam/fused_frame.py):
        # ~45 ms/frame of tunnel dispatch overhead folded away. On CPU the
        # extra mega-program compile buys nothing (dispatch is cheap), so
        # it defaults off there. Override with DROID_FUSED_FRAME=0/1.
        import os
        return os.environ.get(
            "DROID_FUSED_FRAME",
            "1" if jax.default_backend() != "cpu" else "0") == "1"

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """droid.py:61-69, fully pipelined (1-frame decision latency):
        each arriving frame first RESOLVES the previous frame's deferred
        results (keyframe decision of the update dispatched last frame, and
        the previous frame's admission test — both prefetched to the host
        while the device worked), runs the frontend update for the previous
        keyframe, then DISPATCHES this frame's admission test. The host
        never blocks on in-flight device work, so the frame rate is set by
        device compute, not by sync round trips. In steady state the whole
        per-frame device sequence is ONE dispatch (slam/fused_frame.py)."""
        if (self._fused_frame and self.frontend.is_initialized
                and self.filterx._pending is not None
                and self.frontend.graph.edges):
            self._track_fused(tstamp, image, depth, intrinsics)
            return
        self._resolve_prev()
        self.frontend()
        self.filterx.track_begin(tstamp, image, depth, intrinsics)

    def _resolve_prev(self, defer=False):
        """Resolve the previous frame's deferred readbacks (keyframe probe +
        admission test) — a fused frame left ONE combined vector, a legacy
        frame left two separate async copies. Returns the deferred write
        tables when `defer`."""
        if getattr(self, "_pending_vec", None) is not None:
            vec = np.asarray(self._pending_vec)  # one prefetched sync
            self._pending_vec = None
            self.frontend.finalize(
                kf_value=float(vec[0]) if self._pending_ran_upd else None)
            return self.filterx.track_finish(
                defer=defer, resolved=(float(vec[1]), vec[2:]))
        self.frontend.finalize()
        return self.filterx.track_finish(defer=defer)

    def _track_fused(self, tstamp, image, depth, intrinsics):
        """Steady-state frame as a single device dispatch."""
        from . import fused_frame
        f, mf, v = self.frontend, self.filterx, self.video
        g = f.graph

        # start the ~0.5 MB image upload NOW — it crosses the tunnel while
        # the host waits on the previous frame's readback below
        img = np.asarray(image)
        if img.ndim == 3:
            img = img[None]
        image_dev = jax.device_put(img)

        wf = self._resolve_prev(defer=True)
        g.defer = True
        try:
            run_upd = f.t1 < v.counter
            if run_upd:
                tb, sc = f.update_host()
            else:
                # rejected frame: no frontend update — dispatch with
                # n_iters=0 so the program is a pure encode (+probe)
                tb = g.update_tables(None, None, use_inactive=True)
                sc = dict(n_iters=0, kf_beta=f.beta, do_next_state=0,
                          motion_damping=0.0, n_iters2=0, kf_thresh=-1.0)
            enc = mf.track_begin(tstamp, img, depth, intrinsics,
                                 defer=True)
            tabs = g.drain_deferred()
        finally:
            g.defer = False

        _, pi, pj, beta = enc
        wf_index, wf_values, wf_fields = wf
        mv_src, mv_dst, ae_ii, ae_jj, ae_c, ae_slots = tabs
        up_dst = (g.up_dst_table(tb) if g.upsample
                  else np.zeros(tb["nw"], np.int64))

        packed_frame = np.concatenate([
            np.asarray(a).reshape(-1) for a in
            ([wf_index, v.counter - 1], mv_src, mv_dst,
             ae_ii, ae_jj, ae_c, ae_slots, up_dst, pi, pj)
        ]).astype(np.int32)

        # part A: write + evictions + adds + iters1 + probes + encode.
        # Its readback vector's host copy crosses the tunnel while part B
        # (conditional iters2 + motion model) computes, so the next frame's
        # dispatch queues behind B with no device idle.
        (buf_mid, g.pyramid, g.target_inac, g.weight_inac, st, kf_dist,
         gmap, net1, inp1, out_vec) = fused_frame.frame_step_a(
            self.params, v.buf, g.net, g.target, g.weight, g.pyramid,
            g.target_inac, g.weight_inac,
            wf_values, wf_fields,
            packed_frame, len(ae_ii), len(pi), g.corr_impl == "volume",
            tb["packed"], tb["nw"], tb["EA"], g.lookup_impl, tb["ba_shape"],
            np.int32(sc["n_iters"]), np.float32(sc["kf_beta"]),
            np.int32(sc["do_next_state"]),
            np.float32(sc["motion_damping"]), np.float32(beta),
            image_dev)
        try:
            out_vec.copy_to_host_async()
        except Exception:
            pass

        (v.buf, g.net, g.target, g.weight) = fused_frame.frame_step_b(
            self.params, buf_mid, g.pyramid, g.target_inac, g.weight_inac,
            st, kf_dist,
            packed_frame, len(ae_ii), len(pi),
            tb["packed"], tb["nw"], tb["EA"], g.lookup_impl, tb["ba_shape"],
            g.upsample, np.int32(sc["do_next_state"]),
            np.float32(sc["motion_damping"]), np.int32(sc["n_iters2"]),
            np.float32(sc["kf_thresh"]))

        self._pending_vec = out_vec
        self._pending_ran_upd = run_upd
        if run_upd:
            g.bump_age(sc["n_iters"])
        mf.track_begin_complete(gmap, net1, inp1)

    def flush(self):
        """Drain the 1-frame pipeline (resolve the last frame's admission
        and run its frontend update)."""
        self._resolve_prev()
        self.frontend()
        self.frontend.finalize()


class Droid(TrackPipeline):
    def __init__(self, config: DroidConfig):
        self.config = config
        self.params = self._load_params(config.weights)
        self._fused_frame = self._fused_frame_default()

        self.video = DepthVideo(config.image_size, config.buffer,
                                stereo=config.stereo)
        self.filterx = MotionFilter(self.params, self.video,
                                    thresh=config.filter_thresh)
        self.frontend = DroidFrontend(self.params, self.video, config)
        # speculative proximity-distance plumbing (one sync per frame)
        self.frontend.motion_filter = self.filterx
        self.filterx.proximity_probe = self.frontend.proximity_pairs
        self.backend = DroidBackend(self.params, self.video, config)
        self.traj_filler = PoseTrajectoryFiller(self.params, self.video)

        # live visualizer (droid.py:36-39); off unless explicitly enabled
        self._vis_stop = None
        if getattr(config, "enable_vis", False):
            import threading
            from ..eval.viewer import launch_viewer
            self._vis_stop = threading.Event()
            threading.Thread(target=launch_viewer,
                             args=(self.video, None, self._vis_stop),
                             daemon=True).start()

    @staticmethod
    def _load_params(weights_path):
        if weights_path:
            return weights_io.load(weights_path)
        return nets.init_params(jax.random.PRNGKey(0))

    def terminate(self, stream=None, backend_steps=(7, 12)):
        """droid.py:71-86: final global BA passes + trajectory fill.
        Returns the *inverse* (camera-to-world) poses as [T,7] numpy."""
        if self._vis_stop is not None:
            self._vis_stop.set()
        self.flush()
        del self.frontend

        for steps in backend_steps:
            self.backend(steps)

        if stream is not None:
            traj = self.traj_filler(stream)
        else:
            traj = np.asarray(self.video.buf.poses[:self.video.counter])
        return np.asarray(se3.inv(se3.normalize(
            jax.numpy.asarray(traj))))
