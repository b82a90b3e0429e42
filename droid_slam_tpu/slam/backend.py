"""DroidBackend: global bundle adjustment over all keyframes.

Parity with /root/reference/droid_slam/droid_backend.py:9-88 — mono scale
normalization (only without a depth sensor), a fresh factor graph with
on-the-fly correlation and max_factors=16*t, proximity edges over all
keyframes, then the chunked low-memory update loop. The async variant keeps a
persistent graph with age-based eviction.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..state.graph import FactorGraph


class DroidBackend:
    def __init__(self, params, video, args):
        self.video = video
        self.params = params
        self.upsample = getattr(args, "upsample", False)
        self.beta = args.beta
        self.backend_thresh = args.backend_thresh
        self.backend_radius = args.backend_radius
        self.backend_nms = args.backend_nms

    def __call__(self, steps=12, normalize=True):
        t = self.video.counter
        if normalize and not self.video.stereo and \
                not bool(jnp.any(self.video.buf.disps_sens)):
            self.video.normalize()

        graph = FactorGraph(self.video, self.params, corr_impl="alt",
                            max_factors=16 * t, upsample=self.upsample)
        graph.add_proximity_factors(rad=self.backend_radius,
                                    nms=self.backend_nms,
                                    thresh=self.backend_thresh,
                                    beta=self.beta)
        if not graph.edges:
            return
        graph.update_lowmem(steps=steps)
        graph.clear_edges()
        self.video.dirty[:t] = True


class DroidAsyncBackend:
    """Persistent-graph backend used by the async pipeline
    (droid_backend.py:45-88)."""

    def __init__(self, params, video, args, max_age=7):
        self.video = video
        self.max_age = max_age
        self.upsample = getattr(args, "upsample", False)
        self.beta = args.beta
        self.backend_thresh = args.backend_thresh
        self.backend_radius = args.backend_radius
        self.backend_nms = args.backend_nms
        self.graph = FactorGraph(video, params, corr_impl="alt",
                                 max_factors=-1, upsample=self.upsample)

    def __call__(self, steps=12, normalize=True):
        t = self.video.counter
        if normalize and not self.video.stereo and \
                not bool(jnp.any(self.video.buf.disps_sens)):
            self.video.normalize()

        self.graph.add_proximity_factors(rad=self.backend_radius,
                                         nms=self.backend_nms,
                                         thresh=self.backend_thresh,
                                         beta=self.beta)
        if not self.graph.edges:
            return
        self.graph.update_lowmem(steps=steps, use_inactive=True)
        self.graph.rm_factors(self.graph.age > self.max_age, store=True)
        self.video.dirty[:t] = True
