"""Single-dispatch steady-state frame program.

The reference's per-frame hot path (droid_slam/droid.py:61-69) is a chain of
small GPU launches; on this deployment's tunneled TPU every dispatch costs
~15-20 ms of wall clock even when pipelined, which at ~97 ms of device
compute per frame made dispatch overhead a third of the frame budget. This
module fuses the whole per-frame device sequence into ONE XLA program:

  1. keyframe write of the previous frame's features (state/video.py
     `_write_frame_traced`; sentinel index when the frame was rejected);
  2. active->inactive edge eviction moves (`_move_rows_traced`);
  3. new-edge initialization (`_add_edges_traced`);
  4. the fused N x (ConvGRU + DBA) update with keyframe probe and
     next-frame motion model (`_fused_update_traced`);
  5. fnet/cnet encode + admission delta + speculative proximity distances
     for the incoming frame (slam/motion_filter.py
     `_encode_and_delta_traced`).

All host decisions feeding the tables were resolved from the PREVIOUS
frame's prefetched readbacks, so the host dispatches this program without
blocking on in-flight device work. Every index table is padded to a sticky
bucket (sentinel indices drop dead writes) and shipped in ONE int32 vector
(`packed_frame`) — per-array host->device transfers each cost a tunnel
round trip — keeping both the transfer count and the compile key frozen
frame-to-frame.

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

from ..state import graph as graph_mod
from ..state import video as video_mod
from .motion_filter import _encode_and_delta_traced


@partial(jax.jit,
         static_argnames=("wf_fields", "kb", "pb", "with_volumes", "nw",
                          "ea", "lookup_impl", "ba_shape", "upsample"),
         donate_argnames=("buf", "nets_e", "target", "weight", "pyramid",
                          "target_inac", "weight_inac"))
def frame_step(params, buf, nets_e, target, weight, pyramid, target_inac,
               weight_inac,
               wf_values, wf_fields,
               packed_frame, kb, pb, with_volumes,
               packed, nw, ea, lookup_impl, ba_shape,
               n_iters, upsample, kf_beta, do_next_state, motion_damping,
               n_iters2, kf_thresh, beta,
               image):
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

    buf = video_mod._write_frame_traced(buf, wf_index, wf_values, wf_fields)

    target_inac, weight_inac = graph_mod._move_rows_traced(
        (target_inac, weight_inac), (target, weight), mv_src, mv_dst)

    nets_e, target, weight, pyramid = graph_mod._add_edges_traced(
        buf.poses, buf.disps, buf.intrinsics, buf.nets, buf.fmaps,
        nets_e, target, weight, pyramid, ae_ii, ae_jj, ae_c, ae_slots,
        with_volumes)

    (poses, disps, damping, nets_e, target, weight, _eta, _upmask, disps_up,
     kf_dist) = graph_mod._fused_update_traced(
        params, buf.poses, buf.disps, buf.disps_sens, buf.damping,
        buf.intrinsics, buf.inps, pyramid, nets_e, target, weight,
        target_inac, weight_inac, packed, nw, ea, lookup_impl, ba_shape,
        1e-4, 0.1, n_iters, upsample, kf_beta, do_next_state,
        motion_damping, n_iters2, kf_thresh)
    buf = buf._replace(poses=poses, disps=disps, damping=damping)
    if upsample and disps_up is not None:
        buf = buf._replace(disps_up=buf.disps_up.at[up_dst].set(disps_up))

    gmap, net1, inp1, merged = _encode_and_delta_traced(
        params, image, buf.fmaps[kf_index], buf.nets[kf_index],
        buf.inps[kf_index], buf.poses, buf.disps, buf.intrinsics,
        pair_ii, pair_jj, beta)

    # ONE readback vector: [kf_dist, admission delta, probe distances] —
    # separate host copies each cost a tunnel round trip
    import jax.numpy as jnp
    out_vec = jnp.concatenate([kf_dist[None], merged])

    return (buf, nets_e, target, weight, pyramid, target_inac, weight_inac,
            gmap, net1, inp1, out_vec)
