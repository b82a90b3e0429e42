"""Steady-state frame pipeline as TWO chained device programs.

The reference's per-frame hot path (droid_slam/droid.py:61-69) is a chain of
small GPU launches; on this deployment's tunneled TPU the binding wall-clock
cost is the serial decision cycle — the host cannot build frame t's tables
before reading frame t-1's admission delta, keyframe-probe distance, and
proximity distances, and one dependent readback->redispatch cycle costs
~35-40 ms even with async copies (dispatches themselves pipeline fine).

The split hides that cycle behind device time:

  part A (`frame_step_a`): previous-frame keyframe write -> edge eviction
    moves -> new-edge init -> iters1 x (ConvGRU+DBA) -> keyframe probe
    (post-iters1, exactly the reference's placement,
    droid_frontend.py:90-98) -> proximity probe distances -> fnet/cnet
    encode + admission delta of the incoming frame. Emits ONE readback
    vector [kf_dist, delta, distances...].
  part B (`frame_step_b`): conditional iters2 refinement (gated on-device
    by kf_dist) -> next-frame motion model -> optional convex upsampling.

The host dispatches A(t) and B(t) back-to-back; A(t)'s readback copy
crosses the tunnel while B(t) computes, so by the time frame t+1 arrives
the decisions are host-side and the next dispatch queues behind B(t) with
(almost) no device idle.

Known deviation from the reference (documented in BENCH_NOTES.md): the
proximity-proposal distances are computed after iters1 rather than after
iters2, with the next keyframe's motion-model pose applied hypothetically —
necessary to get them off the serial critical path. The keyframe probe and
the admission delta are placement-exact. DROID_FUSED_FRAME=0 restores the
strictly sequential multi-dispatch path.

All host decisions feeding the tables were resolved from the PREVIOUS
frame's prefetched readbacks. Every index table is padded to a sticky
bucket (sentinel indices drop dead writes) and shipped in ONE int32 vector
(`packed_frame`), keeping both the transfer count and the compile key
frozen frame-to-frame.

packed_frame layout (static offsets; lengths are compile keys):
  [wf_index, kf_index,
   mv_src[ea], mv_dst[ea],
   ae_ii[kb], ae_jj[kb], ae_c[kb], ae_slots[kb],
   up_dst[nw],
   pair_ii[pb], pair_jj[pb]]
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..state import graph as graph_mod
from ..state import video as video_mod
from .motion_filter import _encode_delta_traced


def _unpack_packed_frame(packed_frame, ea, kb, nw, pb):
    off = [0]

    def take(n):
        a = jax.lax.dynamic_slice_in_dim(packed_frame, off[0], n)
        off[0] += n
        return a

    wf_index = take(1)[0]
    kf_index = take(1)[0]
    mv_src = take(ea)
    mv_dst = take(ea)
    ae_ii = take(kb)
    ae_jj = take(kb)
    ae_c = take(kb)
    ae_slots = take(kb)
    up_dst = take(nw)
    pair_ii = take(pb)
    pair_jj = take(pb)
    return (wf_index, kf_index, mv_src, mv_dst, ae_ii, ae_jj, ae_c,
            ae_slots, up_dst, pair_ii, pair_jj)


def _spec_gate(prev_vec, spec_mode, adm_thresh, keep_thresh):
    """Speculation gates from the PREVIOUS frame program's readback vector
    (still on device — no host round trip).

    prev_vec[0] = kf_dist of the previous update; prev_vec[1] = admission
    delta of the previous frame. spec_mode bits: 0 = gates forced TRUE
    (tables were built from resolved decisions), 1 = admission gate live,
    2 = keep gate live (set only when the previous frame ran an update).
    Returns (g, g_admit): g gates every state write of this program."""
    live_admit = (spec_mode & 1) > 0
    live_keep = (spec_mode & 2) > 0
    g_admit = jnp.where(live_admit, prev_vec[1] > adm_thresh, True)
    g_keep = jnp.where(live_keep, prev_vec[0] >= keep_thresh, True)
    return g_admit & g_keep, g_admit


@partial(jax.jit,
         static_argnames=("wf_fields", "kb", "pb", "with_volumes", "nw",
                          "ea", "lookup_impl", "ba_shape"),
         donate_argnames=("buf", "nets_e", "target", "weight", "pyramid",
                          "target_inac", "weight_inac"))
def frame_step_a(params, buf, nets_e, target, weight, pyramid, target_inac,
                 weight_inac,
                 wf_values, wf_fields,
                 packed_frame, kb, pb, with_volumes,
                 packed, nw, ea, lookup_impl, ba_shape,
                 n_iters, kf_beta, do_next_state, motion_damping, beta,
                 image, prev_vec, spec_mode, adm_thresh, keep_thresh,
                 probe_lead):
    (wf_index, kf_index, mv_src, mv_dst, ae_ii, ae_jj, ae_c, ae_slots,
     _up_dst, pair_ii, pair_jj) = _unpack_packed_frame(
        packed_frame, ea, kb, nw, pb)

    # speculative-dispatch gates (BENCH_NOTES round-3 sketch): when the host
    # dispatched this program BEFORE resolving the previous frame's
    # admission/keep decisions, every state write is masked by `g` so a
    # mis-speculation leaves device state untouched (the host unwinds its
    # numpy bookkeeping when the readback resolves)
    g, g_admit = _spec_gate(prev_vec, spec_mode, adm_thresh, keep_thresh)
    B = buf.poses.shape[0]
    cap = nets_e.shape[0]
    icap = target_inac.shape[0]
    wf_index = jnp.where(g, wf_index, B + 1)
    mv_dst = jnp.where(g, mv_dst, icap + 1)
    ae_slots = jnp.where(g, ae_slots, cap + 1)
    n_iters = jnp.where(g, n_iters, 0)
    do_next_state = jnp.where(g, do_next_state, 0)
    # on a rejected previous frame the last real keyframe is one earlier
    kf_index = jnp.where(g_admit, kf_index, jnp.maximum(kf_index - 1, 0))

    buf = video_mod._write_frame_traced(buf, wf_index, wf_values, wf_fields)

    target_inac, weight_inac = graph_mod._move_rows_traced(
        (target_inac, weight_inac), (target, weight), mv_src, mv_dst)

    nets_e, target, weight, pyramid = graph_mod._add_edges_traced(
        buf.poses, buf.disps, buf.intrinsics, buf.nets, buf.fmaps,
        nets_e, target, weight, pyramid, ae_ii, ae_jj, ae_c, ae_slots,
        with_volumes)

    state, kf_dist = graph_mod._fused_update_part_a(
        params, buf.poses, buf.disps, buf.disps_sens, buf.damping,
        buf.intrinsics, buf.inps, pyramid, nets_e, target, weight,
        target_inac, weight_inac, packed, nw, ea, lookup_impl, ba_shape,
        1e-4, 0.1, n_iters, kf_beta, write_gate=g)

    # proximity probe on the post-iters1 state, with the next keyframes'
    # motion-model poses applied hypothetically (part B will write the first
    # for real after the conditional refinement). probe_lead=2 extrapolates
    # a second frame ahead — the speculative pipeline consumes these
    # distances one frame later than the strict path.
    (_plan, _s, _i, _j, _v, _in, _kf, _g0, ns_t1,
     _sf) = graph_mod._unpack_frame_tables(packed, ba_shape, ea)
    poses_s, disps_s = state[0], state[1]
    new_pose, new_disp = graph_mod._next_state_pose_disp(
        poses_s, disps_s, ns_t1, motion_damping)
    on = do_next_state > 0
    poses_p = poses_s.at[ns_t1].set(
        jnp.where(on, new_pose, poses_s[ns_t1]))
    disps_p = disps_s.at[ns_t1].set(
        jnp.where(on, new_disp, disps_s[ns_t1]))
    on2 = on & (probe_lead > 1)
    new_pose2, new_disp2 = graph_mod._next_state_pose_disp(
        poses_p, disps_p, ns_t1 + 1, motion_damping)
    poses_p = poses_p.at[ns_t1 + 1].set(
        jnp.where(on2, new_pose2, poses_p[ns_t1 + 1]))
    disps_p = disps_p.at[ns_t1 + 1].set(
        jnp.where(on2, new_disp2, disps_p[ns_t1 + 1]))
    from ..geom import distance as gdist
    d = gdist.frame_distance(poses_p, disps_p, buf.intrinsics[0],
                             pair_ii, pair_jj, beta, bidirectional=True)

    gmap, net1, inp1, dn = _encode_delta_traced(
        params, image, buf.fmaps[kf_index], buf.nets[kf_index],
        buf.inps[kf_index])

    # ONE readback vector: [kf_dist, admission delta, probe distances]
    out_vec = jnp.concatenate([kf_dist[None], dn[None], d])

    return (buf, pyramid, target_inac, weight_inac, state, kf_dist,
            gmap, net1, inp1, out_vec)


@partial(jax.jit,
         static_argnames=("kb", "pb", "nw", "ea", "lookup_impl", "ba_shape",
                          "upsample"),
         donate_argnames=("buf", "state"))
def frame_step_b(params, buf, pyramid, target_inac, weight_inac, state,
                 kf_dist,
                 packed_frame, kb, pb,
                 packed, nw, ea, lookup_impl, ba_shape,
                 upsample, do_next_state, motion_damping, n_iters2,
                 kf_thresh, prev_vec, spec_mode, adm_thresh, keep_thresh):
    (_wf, _kf, _ms, _md, _ai, _aj, _ac, _as, up_dst, _pi,
     _pj) = _unpack_packed_frame(packed_frame, ea, kb, nw, pb)

    # same speculation gates as part A: a mis-speculated frame must leave
    # poses/disps/damping/edge state untouched
    g, _ = _spec_gate(prev_vec, spec_mode, adm_thresh, keep_thresh)
    n_iters2 = jnp.where(g, n_iters2, 0)
    do_next_state = jnp.where(g, do_next_state, 0)
    up_dst = jnp.where(g, up_dst, buf.disps_up.shape[0] + 1)

    (poses, disps, damping, nets_e, target, weight, _eta, _upmask,
     disps_up) = graph_mod._fused_update_part_b(
        state, kf_dist, params, buf.disps_sens, buf.intrinsics, buf.inps,
        pyramid, target_inac, weight_inac, packed, nw, ea, lookup_impl,
        ba_shape, 1e-4, 0.1, upsample, do_next_state, motion_damping,
        n_iters2, kf_thresh)

    buf = buf._replace(poses=poses, disps=disps, damping=damping)
    if upsample and disps_up is not None:
        buf = buf._replace(disps_up=buf.disps_up.at[up_dst].set(disps_up))
    return buf, nets_e, target, weight
