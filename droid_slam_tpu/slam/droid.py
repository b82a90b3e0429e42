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


class Droid:
    def __init__(self, config: DroidConfig):
        self.config = config
        self.params = self._load_params(config.weights)

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

    def track(self, tstamp, image, depth=None, intrinsics=None):
        """droid.py:61-69, fully pipelined (1-frame decision latency):
        each arriving frame first RESOLVES the previous frame's deferred
        results (keyframe decision of the update dispatched last frame, and
        the previous frame's admission test — both prefetched to the host
        while the device worked), runs the frontend update for the previous
        keyframe, then DISPATCHES this frame's admission test. The host
        never blocks on in-flight device work, so the frame rate is set by
        device compute, not by sync round trips."""
        self.frontend.finalize()
        self.filterx.track_finish()
        self.frontend()
        self.filterx.track_begin(tstamp, image, depth, intrinsics)

    def flush(self):
        """Drain the 1-frame pipeline (resolve the last frame's admission
        and run its frontend update)."""
        self.frontend.finalize()
        self.filterx.track_finish()
        self.frontend()
        self.frontend.finalize()

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
