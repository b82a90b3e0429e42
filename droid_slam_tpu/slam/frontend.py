"""DroidFrontend: local sliding-window tracking.

Parity with /root/reference/droid_slam/droid_frontend.py:13-164 — warmup
initialization (neighborhood + proximity edges, 2x8 update iterations),
steady-state updates (age-based eviction, proximity edges, iters1 updates,
keyframe-removal test, iters2 updates), and the damped-velocity motion model
for the next frame.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..lie import se3
from ..state.graph import FactorGraph


# jitted state helpers: every frame index is a traced scalar so these
# compile once, not once per keyframe (recompile control, SURVEY §7.4)

@partial(jax.jit, donate_argnames=("poses", "disps"))
def _next_state(poses, disps, t1, motion_damping):
    """Motion model + median-disp init for the incoming frame
    (droid_frontend.py:49-63)."""
    win = jax.lax.dynamic_slice_in_dim(disps, t1 - 3, 2, axis=0)
    disp_med = jnp.quantile(win, 0.5)

    p_prev = poses[t1 - 1]
    vel = se3.log(se3.mul(p_prev, se3.inv(poses[t1 - 2])))
    new_pose = se3.mul(se3.exp(motion_damping * vel), p_prev)

    poses = poses.at[t1].set(new_pose)
    disps = disps.at[t1].set(disp_med)
    return poses, disps


# NOTE: the reference writes poses[t1]/disps[t1] at the end of _update
# (droid_frontend.py:110-114) and of _initialize (:138-139), but __call__
# invokes _init_next_state immediately after either, which overwrites the
# same slot (:49-63) — those stores are dead. We only perform the surviving
# _init_next_state writes (one dispatch instead of two).


class DroidFrontend:
    def __init__(self, params, video, args):
        self.video = video
        # ba_inactive_bucket=192: the windowed inactive-edge count sits at
        # ~100-150 in steady state (evict rate x window residency); starting
        # at the 192 bucket avoids a mid-run recompile of the fused update
        # (~20 s each on the deployment's remote compiler)
        mesh = None
        n_ep = getattr(args, "edge_parallel", 0)
        if n_ep:
            from ..parallel.frontend import edge_parallel_mesh
            mesh = edge_parallel_mesh(n_ep)
        self.graph = FactorGraph(video, params, max_factors=48,
                                 upsample=getattr(args, "upsample", False),
                                 ba_inactive_bucket=192, mesh=mesh)

        self.t0 = 0
        self.t1 = 0
        self.is_initialized = False
        self.count = 0

        self.max_age = 20
        self.iters1 = 3
        self.iters2 = 2

        self.warmup = args.warmup
        self.beta = args.beta
        self.frontend_nms = args.frontend_nms
        self.keyframe_thresh = args.keyframe_thresh
        self.frontend_window = args.frontend_window
        self.frontend_thresh = args.frontend_thresh
        self.frontend_radius = args.frontend_radius
        self.depth_window = 3
        self.motion_damping = getattr(args, "motion_damping", 0.0)
        self.motion_filter = None  # wired by the Droid facade
        self._probe_key = None
        self.probe_lead = 1  # 2 under speculative dispatch (slam/droid.py)

    def proximity_pairs(self):
        """Candidate pair list for a FUTURE _update's proximity proposal —
        computed speculatively in the frame program so the distance matrix
        arrives with the admission test (no extra sync). `probe_lead` is the
        number of frames ahead the pairs target: 1 for the strict pipeline
        (consumed by the next frame), 2 for the speculative pipeline (the
        next frame dispatches before this probe resolves, so the pairs serve
        the frame after; the newest two frames' poses are motion-model
        extrapolations in the probe)."""
        if not self.is_initialized:
            self._probe_key = None
            return np.zeros(1, np.int64), np.zeros(1, np.int64), self.beta
        lead = self.probe_lead
        t = self.video.counter + lead
        t1n = self.t1 + lead
        ix = np.arange(t1n - 5, t)
        jx = np.arange(max(t1n - self.frontend_window, 0), t)
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        self._probe_key = (t, t1n)
        return ii.reshape(-1), jj.reshape(-1), self.beta

    # ------------------------------------------------------------------

    def _init_next_state(self):
        """Motion model for the next incoming frame
        (droid_frontend.py:49-63)."""
        v = self.video
        damping = self.motion_damping if self.motion_damping >= 0 else 0.0
        with v.get_lock():   # _next_state donates poses/disps (see droid.py)
            poses, disps = _next_state(v.buf.poses, v.buf.disps,
                                       jnp.asarray(self.t1),
                                       jnp.asarray(damping, jnp.float32))
            v.buf = v.buf._replace(poses=poses, disps=disps)

    def update_host(self):
        """Host half of _update (droid_frontend.py:65-117): edge eviction +
        proximity proposal bookkeeping, then the packed update tables and
        dispatch scalars. The device half is either `graph.dispatch_update`
        (standalone path) or the single-dispatch frame program."""
        self.count += 1
        self.t1 += 1

        if self.graph.edges:
            self.graph.rm_factors(self.graph.age > self.max_age, store=True)

        dist = None
        mf = self.motion_filter
        if (mf is not None and mf.pending_distance is not None
                and self._probe_key == (self.video.counter, self.t1)):
            dist = mf.pending_distance

        self.graph.add_proximity_factors(
            self.t1 - 5, max(self.t1 - self.frontend_window, 0),
            rad=self.frontend_radius, nms=self.frontend_nms,
            thresh=self.frontend_thresh, beta=self.beta, remove=True,
            dist=dist)

        damping = self.motion_damping if self.motion_damping >= 0 else 0.0
        tb = self.graph.update_tables(
            None, None, use_inactive=True,
            kf_pair=(self.t1 - 4, self.t1 - 2),
            next_state_t1=self.t1, sens_frame=self.t1 - 1)
        scalars = dict(n_iters=self.iters1, kf_beta=self.beta,
                       do_next_state=1, motion_damping=damping,
                       n_iters2=self.iters2, kf_thresh=self.keyframe_thresh)
        self.video.dirty[int(self.graph.ii.min()):self.t1] = True
        return tb, scalars

    def set_pending_kf(self, kf_dist):
        """Stash the keyframe-probe readback (resolved by finalize when the
        next frame arrives; async host copy so the read is ~free)."""
        self._pending_kf = kf_dist
        if kf_dist is not None:
            try:
                kf_dist.copy_to_host_async()
            except Exception:
                pass

    def _update(self):
        """droid_frontend.py:65-117. ONE dispatch: RGB-D sensor overwrite
        (fe.py:84-88) -> iters1 updates -> keyframe-distance probe ->
        (conditionally, on-device) iters2 refinement + next-frame motion
        model. The probe value is NOT synced here: the decision is finalized
        when the next frame arrives, by which time its async host copy has
        completed."""
        tb, scalars = self.update_host()
        self.set_pending_kf(self.graph.dispatch_update(tb, **scalars))

    def finalize(self, kf_value=None):
        """Apply the previous frame's deferred keyframe decision
        (droid_frontend.py:94-107 host bookkeeping). `kf_value`: the probe
        distance already resolved by the caller (single-readback fused
        path); otherwise read from the async-copied device scalar."""
        if kf_value is None:
            if getattr(self, "_pending_kf", None) is None:
                return
            kf_value = float(self._pending_kf)
            self._pending_kf = None
        d = kf_value
        if d < 2 * self.keyframe_thresh:
            # the conditional iters2/motion-model did NOT run on-device;
            # drop the redundant keyframe and re-init the prediction slot
            self.graph.rm_keyframe(self.t1 - 3)
            with self.video.get_lock():
                self.video.counter -= 1
                self.t1 -= 1
            self._init_next_state()
        else:
            self.graph.bump_age(self.iters2)

    def _initialize(self):
        """droid_frontend.py:119-151."""
        self.t0 = 0
        self.t1 = self.video.counter

        self.graph.add_neighborhood_factors(self.t0, self.t1, r=3)
        self.graph.update(1, use_inactive=True, n_iters=8)

        self.graph.add_proximity_factors(0, 0, rad=2, nms=2,
                                         thresh=self.frontend_thresh,
                                         remove=False)
        self.graph.update(1, use_inactive=True, n_iters=8)

        self.is_initialized = True
        with self.video.get_lock():
            self.video.ready = True
            self.video.dirty[:self.t1] = True

        self.graph.rm_factors(self.graph.ii < self.warmup - 4, store=True)
        # shrink the slot capacity to the steady-state bucket: the GRU/corr
        # cost of every later update scales with it (init's neighborhood
        # graph transiently needs more slots than max_factors)
        self.graph.compact()

    def __call__(self):
        """droid_frontend.py:153-164 (_update handles the next-frame motion
        model itself — folded into its fused dispatch)."""
        if not self.is_initialized and self.video.counter == self.warmup:
            self._initialize()
            self._init_next_state()
        elif self.is_initialized and self.t1 < self.video.counter:
            self._update()
