"""FactorGraph: the dynamic covisibility graph, recast for static-shape XLA.

TPU re-architecture of /root/reference/droid_slam/factor_graph.py. The
reference concatenates/slices CUDA tensors as edges come and go; under XLA
that would recompile constantly. Instead:

  * edge bookkeeping (ii/jj/age, dedup, NMS edge proposal, eviction) lives on
    the host in numpy — tiny O(t^2) work;
  * per-edge device state (GRU hidden, target, weight, and the correlation
    pyramid) lives in slot-stable padded buffers; adding/removing edges only
    changes *index arrays*, never array shapes;
  * the per-iteration compute (reproject -> corr lookup -> ConvGRU -> DBA) is
    a handful of jitted static-shape programs keyed by bucket sizes.

Edge proposal logic (add_neighborhood_factors, add_proximity_factors with
greedy NMS suppression) reproduces factor_graph.py:332-412 exactly.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ba import inference as ba_inference
from ..geom import projective as pops
from ..models import nets
from ..ops import corr as corr_ops
from .video import DepthVideo, _pad_to


def _lowmem_spill_cfg():
    """Host-spill knobs for global BA (read per call — host-side decisions
    only, nothing is baked into traced programs):
      DROID_LOWMEM_SPILL     "auto" (default: spill when the edge GRU state
                             exceeds the threshold) | "1" force | "0" never
      DROID_LOWMEM_SPILL_GB  resident-size threshold (default 3.0 — t<=500
                             at 240x320 stays resident, t>=640 spills)
      DROID_LOWMEM_GROUP_GB  per-group device buffer budget (default 1.0)
      DROID_LOWMEM_RESIDENT_GB  when spilling, keep up to this much edge
                             state device-resident across steps (hybrid
                             residency — only the overflow streams;
                             default 1.0 — a 2.5 GB budget stalled a
                             t=800 run on the 16 GB chip, round 5; a
                             pressure retry forces 0)
    """
    import os
    mode = os.environ.get("DROID_LOWMEM_SPILL", "auto")
    thresh = float(os.environ.get("DROID_LOWMEM_SPILL_GB", "3.0"))
    group = float(os.environ.get("DROID_LOWMEM_GROUP_GB", "1.0"))
    resident = float(os.environ.get("DROID_LOWMEM_RESIDENT_GB", "1.0"))
    return mode, thresh, group, resident


def _bucket(n, buckets):
    for b in buckets:
        if n <= b:
            return b
    # beyond the tuned table, grow geometrically instead of failing: long
    # sequences legitimately exceed it (backend max_factors = 16*t puts
    # t=200 keyframes at 3200 edges), and doubling keeps the number of
    # distinct jit keys logarithmic in sequence length
    b = buckets[-1]
    while b < n:
        b *= 2
    return b


ACTIVE_BUCKETS = (16, 32, 48, 64, 96, 128, 192, 256)
WINDOW_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)
AE_BUCKET = 16  # sticky new-edge bucket of the single-dispatch frame path


# ---------------------------------------------------------------------------
# jitted cores
# ---------------------------------------------------------------------------

def _update_core_traced(params, poses, disps, intrinsics, inps_buf, pyramid,
                        nets_e, target, weight, slots, ii, jj, valid, g0,
                        nw: int, lookup_impl: str = "gather",
                        slot_native: bool = False, pre=None,
                        compute_upmask: bool = True, psum_axis=None):
    """One GRU+heads iteration over the active edges (factor_graph.py:215-238).

    pyramid: tuple of [EB, HW, hl, wl] slot-addressed corr volumes.
    nets_e/target/weight: [EB,...] slot-addressed edge state.
    slots/ii/jj/valid: [EA] active-edge views.

    With ``slot_native`` the caller guarantees EA == EB and that the edge
    tables are indexed BY SLOT (slots == arange) — then every per-edge
    gather/scatter (nets_e[slots], the coords scatter, the corr result
    gather) is the identity and drops out of the program, saving ~100 MB of
    HBM shuffling per iteration.

    Returns per-active-edge (net, target, weight, coords1) + per-window-frame
    (eta [nw,h,w], upmask [nw,h,w,576]).
    """
    EA = slots.shape[0]
    h, w = disps.shape[-2:]
    hw = h * w

    coords1, _, _ = pops.projective_transform(poses, disps, intrinsics, ii, jj)
    coords0 = pops.coords_grid(h, w)
    tgt_e = target if slot_native else target[slots]
    resd = tgt_e.reshape(EA, 2, hw).transpose(0, 2, 1).reshape(
        EA, h, w, 2) - coords1
    motn = jnp.concatenate([coords1 - coords0, resd], axis=-1)
    motn = jnp.clip(motn, -64.0, 64.0)

    # correlation lookup with slot indirection. The volumes stay in SLOT
    # order (permuting them would copy ~1 GB of HBM per iteration); instead
    # the small coords tensor is scattered into slot order, the lookup runs
    # slot-native, and the small result is gathered back into edge order
    # (both no-ops under slot_native).
    cflat = coords1.reshape(EA, hw, 2)
    if lookup_impl == "pallas":
        from ..ops import corr_pallas
        corr = corr_pallas.lookup_pyramid_slots(pyramid, slots, cflat,
                                                corr_ops.RADIUS)
        corr = corr.reshape(EA, h, w, -1)
    else:
        EB = pyramid[0].shape[0]
        if slot_native:
            c_slot = cflat
        else:
            wslots = jnp.where(valid, slots, EB + 1)  # drop invalid edges
            c_slot = jnp.zeros((EB, hw, 2), cflat.dtype).at[wslots].set(cflat)
        if lookup_impl == "dense_cm":
            # channel-major pyramid [EB, hl, wl, HW]: taps come out
            # [EB, 196, HW] and stay channel-major into the corr encoder
            # (models/nets.py absorbs the NHWC transpose into the 1x1
            # encoder matmul)
            corr = corr_ops.lookup_pyramid_cm(pyramid, c_slot,
                                              corr_ops.RADIUS,
                                              out_dtype=jnp.bfloat16)
            if not slot_native:
                corr = corr[slots]
        else:
            outs = []
            for lvl, vol in enumerate(pyramid):
                outs.append(corr_ops._lookup_level_impl(
                    vol, c_slot / (2.0 ** lvl), corr_ops.RADIUS, lookup_impl,
                    out_dtype=jnp.bfloat16))
            corr = jnp.concatenate(outs, axis=-1)
            if not slot_native:
                corr = corr[slots]
            corr = corr.reshape(EA, h, w, -1)

    cdt = jnp.bfloat16
    # padded edge slots must not contaminate the per-frame aggregation:
    # route them to a dump segment (nw) and drop it
    agg_ii = jnp.where(valid, jnp.clip(ii - g0, 0, nw - 1), nw)
    net_e = nets_e if slot_native else nets_e[slots]
    inp_e = None if pre is not None else inps_buf[ii].astype(cdt)
    net, delta, weight_new, eta, upmask = nets.update_module(
        params, net_e.astype(cdt), inp_e,
        corr.astype(cdt), motn.astype(cdt), ii=agg_ii, num_frames=nw + 1,
        pre=pre, compute_upmask=compute_upmask, psum_axis=psum_axis,
        pallas_ok=True)
    eta = eta[:nw]
    upmask = upmask[:nw] if compute_upmask else None

    target_new = coords1 + delta.astype(jnp.float32)
    target_new = target_new.reshape(EA, hw, 2).transpose(0, 2, 1)
    weight_new = weight_new.astype(jnp.float32)
    weight_new = weight_new.reshape(EA, hw, 2).transpose(0, 2, 1)
    vm = valid[:, None, None].astype(jnp.float32)
    return (net, target_new * vm, weight_new * vm, eta.astype(jnp.float32),
            upmask, coords1)


# standalone jit of the single-iteration core (diagnostics / benchmarks)
update_core_jit = jax.jit(_update_core_traced,
                          static_argnames=("nw", "lookup_impl"))


def _pack_indices(*arrays):
    """Concatenate host index arrays into ONE int32 vector (a single
    host->device transfer per frame instead of ~15 tunnel round trips)."""
    return np.concatenate([np.asarray(a).reshape(-1).astype(np.int32)
                           for a in arrays])


def _unpack_frame_tables(packed, ba_shape, ea):
    """Static-offset unpack of the per-frame index vector (BA plan,
    active-edge views, inactive slots, keyframe probe, scalars)."""
    E = ba_shape.edges
    NWp = ba_shape.window
    RMAX = ba_shape.rmax
    off = [0]

    def take(n, shape=None):
        a = jax.lax.dynamic_slice_in_dim(packed, off[0], n)
        off[0] += n
        return a.reshape(shape) if shape else a

    plan = ba_inference.BAPlan(
        ii=take(E), jj=take(E), edge_valid=take(E).astype(bool),
        k_valid=take(NWp).astype(bool), row_pose=take(NWp + E),
        row_depth=take(NWp + E), rk_idx=take(NWp * RMAX, (NWp, RMAX)),
        g0=take(1)[0], t0=take(1)[0], t1=take(1)[0])
    slots = take(ea)
    ii = take(ea)
    jj = take(ea)
    valid = take(ea).astype(bool)
    ib = packed.shape[0] - off[0] - 5
    inac_slots = take(ib)
    kf_pair = take(2)
    g0 = take(1)[0]
    ns_t1 = take(1)[0]
    sens_frame = take(1)[0]
    return (plan, slots, ii, jj, valid, inac_slots, kf_pair, g0, ns_t1,
            sens_frame)


def _local_edge_tables(edge_axis, nets_e_local, ii, jj, valid):
    """Slice this shard's rows out of the full per-edge tables. Inside a
    shard_map over ``edge_axis`` the slot buffers arrive pre-sharded
    (contiguous blocks in axis order), so the local view of the slot-native
    tables is the matching contiguous block; slots are the local arange."""
    eloc = nets_e_local.shape[0]
    off = jax.lax.axis_index(edge_axis) * eloc
    sl = lambda v: jax.lax.dynamic_slice_in_dim(v, off, eloc)
    return jnp.arange(eloc), sl(ii), sl(jj), sl(valid)


def _make_iteration(params, disps_sens, intrinsics, inps_buf, pyramid,
                    target_inac_buf, weight_inac_buf, plan, slots, ii, jj,
                    valid, inac_slots, g0, nw, lookup_impl, ba_shape, lm, ep,
                    slot_native: bool = False, edge_axis=None,
                    ii_full=None, valid_full=None):
    """One (GRU update + DBA) iteration as a state->state closure
    (factor_graph.py:215-263 semantics).

    The context features' GRU contributions (gru_context_pre) and the
    inactive-edge gathers are computed HERE — once per traced program — and
    captured by the closure, so the fori_loop body sees them as loop
    constants. The upsample-mask head is NOT run in the loop (only the last
    iteration's mask is ever consumed; the caller recomputes it from the
    final GRU state, saving a [nw,h,w,576] write per iteration).

    ``edge_axis`` (parallel/frontend.py): this trace runs inside a
    shard_map whose named axis shards the edge/slot dimension — the
    per-edge inputs (pyramid/nets_e/target/weight and the slots/ii/jj/valid
    views) are the LOCAL shard, per-frame aggregations psum over the axis,
    and the (replicated) dense BA consumes all-gathered target/weight.
    ``ii_full``/``valid_full`` are the unsharded edge tables the replicated
    per-frame damping mask needs."""
    win = g0 + jnp.arange(nw)
    tgt_inac = target_inac_buf[inac_slots]
    wgt_inac = weight_inac_buf[inac_slots]
    pre = nets.gru_context_pre(params, inps_buf[ii].astype(jnp.bfloat16))
    if edge_axis is None:
        ii_full, valid_full = ii, valid

    def iteration(state):
        poses, disps, damping, nets_e, target, weight, _ = state
        h, w = disps.shape[-2:]
        hw = h * w
        net_e, tgt_e, wgt_e, eta, _upm, _ = _update_core_traced(
            params, poses, disps, intrinsics, inps_buf, pyramid, nets_e,
            target, weight, slots, ii, jj, valid, g0, nw, lookup_impl,
            slot_native, pre=pre, compute_upmask=False,
            psum_axis=edge_axis)

        if slot_native:
            # tables are slot-ordered: direct assignment, no select needed.
            # tgt_e/wgt_e are already zero-masked by validity inside the
            # core (the `* vm` at _update_core_traced's return), and every
            # consumer of nets_e masks invalid slots (the aggregation dump
            # segment, BA's edge_valid, the add-edges overwrite), so the
            # unmasked net rows of padded slots are never observable —
            # the [E,h,w,128] masked select this replaces cost
            # ~1.5 ms/frame on v5e (broadcast_select fusions).
            nets_e = net_e.astype(nets_e.dtype)
            target = tgt_e
            weight = wgt_e
        else:
            # scatter edge state back to the slot buffers (invalid dropped)
            cap = nets_e.shape[0]
            wslots = jnp.where(valid, slots, cap + 1)
            nets_e = nets_e.at[wslots].set(net_e.astype(nets_e.dtype))
            target = target.at[wslots].set(tgt_e)
            weight = weight.at[wslots].set(wgt_e)

        # per-frame damping for frames present in ii (factor_graph.py:238)
        agg_ii = jnp.clip(ii_full - g0, 0, nw - 1)
        present = jax.ops.segment_sum(
            valid_full.astype(jnp.float32), agg_ii, num_segments=nw) > 0
        damping = damping.at[win].set(
            jnp.where(present[:, None, None], eta, damping[win]))

        # dense bundle adjustment over inactive + active edges
        tgt_act = target if slot_native else target[slots]
        wgt_act = weight if slot_native else weight[slots]
        if edge_axis is not None:
            # the replicated BA needs the full edge set: ~2.4 MB per
            # iteration over ICI at the bench shapes (ROOFLINE.md #1)
            tgt_act = jax.lax.all_gather(tgt_act, edge_axis, axis=0,
                                         tiled=True)
            wgt_act = jax.lax.all_gather(wgt_act, edge_axis, axis=0,
                                         tiled=True)
        tgt_ba = jnp.concatenate([tgt_inac, tgt_act], axis=0)
        wgt_ba = jnp.concatenate([wgt_inac, wgt_act], axis=0)
        pad = ba_shape.edges - tgt_ba.shape[0]
        if pad > 0:
            tgt_ba = jnp.concatenate(
                [tgt_ba, jnp.zeros((pad, 2, hw), tgt_ba.dtype)], axis=0)
            wgt_ba = jnp.concatenate(
                [wgt_ba, jnp.zeros((pad, 2, hw), wgt_ba.dtype)], axis=0)
        poses, disps = ba_inference.ba_iterations(
            ba_shape, poses, disps, disps_sens, damping, intrinsics[0],
            tgt_ba[:ba_shape.edges], wgt_ba[:ba_shape.edges], plan, lm, ep)
        return (poses, disps, damping, nets_e, target, weight, eta)

    def final_upmask(nets_e):
        """The deferred upsample-mask of the LAST iteration: graph_agg on the
        final GRU state — identical to the mask that iteration would have
        produced (the loop's masked select writes net back to nets_e for
        exactly the valid slots the aggregation reads)."""
        agg_ii = jnp.where(valid, jnp.clip(ii - g0, 0, nw - 1), nw)
        net_e = nets_e if slot_native else nets_e[slots]
        _eta, upmask = nets.graph_agg(params, net_e.astype(jnp.bfloat16),
                                      agg_ii, nw + 1, psum_axis=edge_axis)
        return upmask[:nw]

    iteration.final_upmask = final_upmask
    return iteration


def _next_state_pose_disp(poses, disps, ns_t1, motion_damping):
    """droid_frontend.py:49-63 motion model values for the next frame."""
    from ..lie import se3 as _se3
    dwin = jax.lax.dynamic_slice_in_dim(disps, ns_t1 - 3, 2, axis=0)
    p_prev = poses[ns_t1 - 1]
    vel = _se3.log(_se3.mul(p_prev, _se3.inv(poses[ns_t1 - 2])))
    new_pose = _se3.mul(_se3.exp(motion_damping * vel), p_prev)
    return new_pose, jnp.quantile(dwin, 0.5)


def _fused_update_part_a(params, poses, disps, disps_sens, damping,
                         intrinsics, inps_buf, pyramid, nets_e, target,
                         weight, target_inac_buf, weight_inac_buf, packed,
                         nw: int, ea: int, lookup_impl: str, ba_shape,
                         lm, ep, n_iters, kf_beta, write_gate=None,
                         edge_axis=None):
    """iters1 half of the fused update: RGB-D sensor overwrite, n_iters x
    (GRU+DBA), and the keyframe-distance probe (which the reference computes
    after iters1, droid_frontend.py:90-98). Returns the iteration-carry
    state + kf_dist so part B (conditional refinement + motion model) can
    run in a separate dispatch whose device time hides the probe's host
    copy latency. `write_gate` (speculative dispatch) masks the sensor
    overwrite; the iterations are masked by the caller via n_iters."""
    tabs = _unpack_frame_tables(packed, ba_shape, ea)
    (plan, slots, ii, jj, valid, inac_slots, kf_pair, g0, ns_t1,
     sens_frame) = tabs
    if write_gate is not None:
        sens_frame = jnp.where(write_gate, sens_frame, -1)

    # RGB-D: overwrite disparity where the sensor is valid, fused into this
    # dispatch (droid_frontend.py:84-88; sens_frame < 0 skips)
    sfc = jnp.clip(sens_frame, 0)
    sens_sf = disps_sens[sfc]
    disps = disps.at[sfc].set(
        jnp.where((sens_frame >= 0) & (sens_sf > 0), sens_sf, disps[sfc]))

    ii_f, valid_f = ii, valid
    if edge_axis is not None:
        slots, ii, jj, valid = _local_edge_tables(edge_axis, nets_e, ii, jj,
                                                  valid)
    iteration = _make_iteration(
        params, disps_sens, intrinsics, inps_buf, pyramid, target_inac_buf,
        weight_inac_buf, plan, slots, ii, jj, valid, inac_slots, g0, nw,
        lookup_impl, ba_shape, lm, ep, slot_native=True,
        edge_axis=edge_axis, ii_full=ii_f, valid_full=valid_f)

    h8, w8 = disps.shape[-2:]
    state = (poses, disps, damping, nets_e, target, weight,
             jnp.zeros((nw, h8, w8)))
    state = jax.lax.fori_loop(0, n_iters, lambda _, s: iteration(s), state)

    # keyframe-distance probe on the updated state (droid_frontend.py:94-98)
    from ..geom import distance as gdist
    kf_dist = gdist.frame_distance(
        state[0], state[1], intrinsics[0], kf_pair[:1], kf_pair[1:2],
        kf_beta, bidirectional=True)[0]
    return state, kf_dist


def _fused_update_part_b(state, kf_dist, params, disps_sens, intrinsics,
                         inps_buf, pyramid, target_inac_buf, weight_inac_buf,
                         packed, nw: int, ea: int, lookup_impl: str,
                         ba_shape, lm, ep, upsample: bool, do_next_state,
                         motion_damping, n_iters2, kf_thresh,
                         edge_axis=None):
    """Conditional iters2 refinement (droid_frontend.py:98-107) + next-frame
    motion model + optional convex upsampling, from part A's carry state."""
    tabs = _unpack_frame_tables(packed, ba_shape, ea)
    (plan, slots, ii, jj, valid, inac_slots, _kf_pair, g0, ns_t1,
     _sens_frame) = tabs

    ii_f, valid_f = ii, valid
    if edge_axis is not None:
        slots, ii, jj, valid = _local_edge_tables(edge_axis, state[3], ii,
                                                  jj, valid)
    iteration = _make_iteration(
        params, disps_sens, intrinsics, inps_buf, pyramid, target_inac_buf,
        weight_inac_buf, plan, slots, ii, jj, valid, inac_slots, g0, nw,
        lookup_impl, ba_shape, lm, ep, slot_native=True,
        edge_axis=edge_axis, ii_full=ii_f, valid_full=valid_f)

    keep_kf = kf_dist >= 2.0 * kf_thresh
    state = jax.lax.cond(
        keep_kf,
        lambda s: jax.lax.fori_loop(0, n_iters2, lambda _, x: iteration(x), s),
        lambda s: s, state)
    (poses, disps, damping, nets_e, target, weight, eta_last) = state

    # deferred upsample-mask head: reconstructed from the final GRU state,
    # equal to the last executed iteration's mask (see _make_iteration)
    upmask_last = iteration.final_upmask(nets_e)

    disps_up = None
    if upsample:
        win = g0 + jnp.arange(nw)
        disps_up = nets.upsample_disp(disps[win], upmask_last.astype(
            jnp.float32))

    # droid_frontend.py:49-63 motion model for the next incoming frame,
    # applied when requested and the keyframe was kept
    new_pose, new_disp = _next_state_pose_disp(poses, disps, ns_t1,
                                               motion_damping)
    on = (do_next_state > 0) & keep_kf
    poses = poses.at[ns_t1].set(jnp.where(on, new_pose, poses[ns_t1]))
    disps = disps.at[ns_t1].set(jnp.where(on, new_disp, disps[ns_t1]))

    return (poses, disps, damping, nets_e, target, weight, eta_last,
            upmask_last, disps_up)


def _fused_update_traced(params, poses, disps, disps_sens, damping, intrinsics,
                         inps_buf, pyramid, nets_e, target, weight,
                         target_inac_buf, weight_inac_buf, packed,
                         nw: int, ea: int, lookup_impl: str,
                         ba_shape, lm, ep, n_iters, upsample: bool,
                         kf_beta=0.3, do_next_state=0, motion_damping=0.0,
                         n_iters2=0, kf_thresh=-1.0, edge_axis=None):
    """N x (ConvGRU update + DBA) fused into ONE XLA program — one dispatch
    per frontend call instead of ~8 (each dispatch costs ~10-20 ms over the
    deployment's TPU tunnel; fusing is also what lets XLA overlap the GRU
    convs with the BA linear algebra).

    `packed` carries every per-frame index table (BA plan, active-edge
    views, inactive slots, keyframe probe) as one int32 vector; it is
    unpacked with static offsets. The iteration count and the next-state
    flag are DYNAMIC (fori_loop / where), so one compiled program serves
    every frontend call — each distinct compile of this program costs many
    minutes on the deployment's remote compiler.
    """
    state, kf_dist = _fused_update_part_a(
        params, poses, disps, disps_sens, damping, intrinsics, inps_buf,
        pyramid, nets_e, target, weight, target_inac_buf, weight_inac_buf,
        packed, nw, ea, lookup_impl, ba_shape, lm, ep, n_iters, kf_beta,
        edge_axis=edge_axis)
    (poses, disps, damping, nets_e, target, weight, eta_last, upmask_last,
     disps_up) = _fused_update_part_b(
        state, kf_dist, params, disps_sens, intrinsics, inps_buf, pyramid,
        target_inac_buf, weight_inac_buf, packed, nw, ea, lookup_impl,
        ba_shape, lm, ep, upsample, do_next_state, motion_damping, n_iters2,
        kf_thresh, edge_axis=edge_axis)
    return (poses, disps, damping, nets_e, target, weight, eta_last,
            upmask_last, disps_up, kf_dist)


_fused_update = jax.jit(
    _fused_update_traced,
    static_argnames=("nw", "ea", "lookup_impl", "ba_shape", "upsample"),
    donate_argnames=("poses", "disps", "damping", "nets_e", "target",
                     "weight"))


def _lookup_slots(vol, slots, coords, radius):
    """corr window gather with the edge->slot indirection folded in.

    vol [EB,HW,h2,w2]; slots [EA]; coords [EA,HW,2] at this level's scale.
    """
    EB, HW, h2, w2 = vol.shape
    EA = slots.shape[0]
    r = radius
    rd = 2 * r + 1

    x0 = jnp.floor(coords[..., 0])
    y0 = jnp.floor(coords[..., 1])
    dx = (coords[..., 0] - x0)[..., None]
    dy = (coords[..., 1] - y0)[..., None]

    ti = jnp.arange(rd + 1, dtype=coords.dtype)
    xi = jnp.broadcast_to(x0[..., None, None] - r + ti[None, None, :, None],
                          x0.shape + (rd + 1, rd + 1))
    yj = jnp.broadcast_to(y0[..., None, None] - r + ti[None, None, None, :],
                          y0.shape + (rd + 1, rd + 1))
    inb = (xi >= 0) & (xi < w2) & (yj >= 0) & (yj < h2)
    idx = (jnp.clip(yj, 0, h2 - 1) * w2 + jnp.clip(xi, 0, w2 - 1)).astype(jnp.int32)

    volf = vol.reshape(EB, HW, h2 * w2)
    taps = volf[slots[:, None, None],
                jnp.arange(HW)[None, :, None],
                idx.reshape(EA, HW, -1)]
    taps = (taps.astype(jnp.float32)
            * inb.reshape(EA, HW, -1).astype(jnp.float32))
    taps = taps.reshape(EA, HW, rd + 1, rd + 1)

    out = ((1 - dx) * (1 - dy))[..., None] * taps[:, :, :rd, :rd] \
        + (dx * (1 - dy))[..., None] * taps[:, :, 1:, :rd] \
        + ((1 - dx) * dy)[..., None] * taps[:, :, :rd, 1:] \
        + (dx * dy)[..., None] * taps[:, :, 1:, 1:]
    return out.reshape(EA, HW, rd * rd)


def _lowmem_chunk_core_traced(params, poses, disps, intrinsics, inps_buf,
                              fpyr, nets_e, target, slots, ii, jj, ii_rows,
                              jj_rows, valid, g0, nw: int, net_slots=None):
    """One GRU iteration on a source-frame chunk of edges using on-the-fly
    correlation (factor_graph.py:285-307). fpyr: tuple of flattened
    [B*c, hl, wl, 128] feature pyramids.

    ``net_slots``: row indices into ``nets_e`` when it is a group-local
    spill buffer rather than the cap-wide slot buffer (host-spilled global
    BA, _lowmem_sweep_group); ``slots`` keeps indexing target/weight."""
    EA = slots.shape[0]
    h, w = disps.shape[-2:]
    hw = h * w

    coords1, _, _ = pops.projective_transform(poses, disps, intrinsics, ii, jj)
    coords0 = pops.coords_grid(h, w)
    resd = target[slots].reshape(EA, 2, hw).transpose(0, 2, 1).reshape(
        EA, h, w, 2) - coords1
    motn = jnp.clip(jnp.concatenate([coords1 - coords0, resd], axis=-1),
                    -64.0, 64.0)

    corr = corr_ops.alt_lookup(fpyr, coords1, ii_rows, jj_rows)

    cdt = jnp.bfloat16
    net_rows = slots if net_slots is None else net_slots
    agg_ii = jnp.where(valid, jnp.clip(ii - g0, 0, nw - 1), nw)
    net, delta, weight_new, eta, upmask = nets.update_module(
        params, nets_e[net_rows].astype(cdt), inps_buf[ii].astype(cdt),
        corr.astype(cdt), motn.astype(cdt), ii=agg_ii, num_frames=nw + 1)
    eta = eta[:nw]
    upmask = upmask[:nw]

    target_new = (coords1 + delta.astype(jnp.float32)) \
        .reshape(EA, hw, 2).transpose(0, 2, 1)
    weight_new = weight_new.astype(jnp.float32) \
        .reshape(EA, hw, 2).transpose(0, 2, 1)
    vm = valid[:, None, None].astype(jnp.float32)
    return (net, target_new * vm, weight_new * vm, eta.astype(jnp.float32),
            upmask)


@partial(jax.jit, static_argnames=("upsample",),
         donate_argnames=("nets_g", "target", "weight", "damping",
                          "disps_up"))
def _lowmem_sweep_group(params, poses, disps, intrinsics, inps_buf, fpyr,
                        nets_g, target, weight, damping, disps_up,
                        c_slots, c_lslots, c_ii, c_jj, c_iirows, c_jjrows,
                        c_valid, c_g0, upsample: bool = False):
    """The GRU half of a global-BA step over ONE spill group of chunks.

    Identical chunk math to the resident sweep, but the per-edge
    GRU state lives in ``nets_g`` — a packed [RG,h,w,128] buffer holding
    only this group's edges (rows addressed by ``c_lslots``), streamed
    host<->device by the driver (update_lowmem spill mode) so the full
    ~cap*hw*256B edge state (5 GB at t=1000/240x320 — the single-chip
    memory wall, BENCH_NOTES R7c §3) never resides on device at once.
    target/weight/damping/disps_up stay cap-/window-wide on device (they
    are ~30x smaller and the BA needs them whole)."""
    cap = target.shape[0]
    RG = nets_g.shape[0]

    def chunk_body(state, inputs):
        nets_g, target, weight, damping, disps_up = state
        slots, lslots, ii, jj, ii_rows, jj_rows, valid, g0c = inputs
        net_e, tgt_e, wgt_e, eta, upmask = _lowmem_chunk_core_traced(
            params, poses, disps, intrinsics, inps_buf, fpyr, nets_g,
            target, slots, ii, jj, ii_rows, jj_rows, valid, g0c, 8,
            net_slots=lslots)
        wl = jnp.where(valid, lslots, RG + 1)
        ws = jnp.where(valid, slots, cap + 1)
        nets_g = nets_g.at[wl].set(net_e.astype(nets_g.dtype))
        target = target.at[ws].set(tgt_e)
        weight = weight.at[ws].set(wgt_e)
        agg_ii = jnp.clip(ii - g0c, 0, 7)
        present = jax.ops.segment_sum(
            valid.astype(jnp.float32), agg_ii, num_segments=8) > 0
        winc = g0c + jnp.arange(8)
        damping = damping.at[winc].set(
            jnp.where(present[:, None, None], eta, damping[winc]))
        if upsample:
            du = nets.upsample_disp(disps[winc],
                                    upmask.astype(jnp.float32))
            disps_up = disps_up.at[winc].set(
                jnp.where(present[:, None, None], du, disps_up[winc]))
        return (nets_g, target, weight, damping, disps_up), None

    state = (nets_g, target, weight, damping, disps_up)
    state, _ = jax.lax.scan(chunk_body, state,
                            (c_slots, c_lslots, c_ii, c_jj, c_iirows,
                             c_jjrows, c_valid, c_g0))
    return state


@partial(jax.jit, static_argnames=("ba_shape",),
         donate_argnames=("poses", "disps"))
def _lowmem_ba_step(poses, disps, disps_sens, damping, intrinsics,
                    target, weight, target_inac_buf, weight_inac_buf,
                    inac_slots, act_slots, ba_shape, ba_plan, lm, ep):
    """The dense-BA half of a global-BA step (fg.py:311-328), split out of
    the sweep so resident/spilled/mesh paths share it."""
    tgt_ba = jnp.concatenate([target_inac_buf[inac_slots],
                              target[act_slots]], axis=0)
    wgt_ba = jnp.concatenate([weight_inac_buf[inac_slots],
                              weight[act_slots]], axis=0)
    return ba_inference.ba_iterations(
        ba_shape, poses, disps, disps_sens, damping, intrinsics[0],
        tgt_ba[:ba_shape.edges], wgt_ba[:ba_shape.edges], ba_plan, lm, ep)


@partial(jax.jit, static_argnames=("cm",))
def _build_edge_volumes(fmap1, fmap2, cm: bool = False):
    """4-level corr pyramid for a batch of new edges (modules/corr.py:23-38)."""
    build = corr_ops.build_pyramid_cm if cm else corr_ops.build_pyramid
    pyr = build(fmap1, fmap2, corr_ops.NUM_LEVELS)
    return tuple(p.astype(jnp.bfloat16) for p in pyr)


def _add_edges_traced(poses, disps, intrinsics, nets_buf, fmaps, nets_e,
                      target, weight, pyramid, ii, jj, cam2, slots,
                      with_volumes: bool):
    """Initialize new edges in one dispatch (factor_graph.py:125-150):
    target = current reprojection, weight = 0, net = video.nets[ii], and
    (volume impl) the per-edge correlation pyramid."""
    kb = ii.shape[0]
    h, w = disps.shape[-2:]
    hw = h * w
    coords, _, _ = pops.projective_transform(poses, disps, intrinsics, ii, jj)
    target0 = coords.reshape(kb, hw, 2).transpose(0, 2, 1)

    nets_e = nets_e.at[slots].set(nets_buf[ii].astype(nets_e.dtype))
    target = target.at[slots].set(target0)
    weight = weight.at[slots].set(jnp.zeros_like(target0))

    if with_volumes:
        f1 = fmaps[ii, 0]
        f2 = fmaps[jj, cam2]
        # layout inferred from the slot buffers: [cap,HW,h,w] standard vs
        # [cap,h,w,HW] channel-major (lookup_impl "dense_cm")
        cm = pyramid[0].shape[-1] == hw
        build = corr_ops.build_pyramid_cm if cm else corr_ops.build_pyramid
        vols = build(f1, f2, corr_ops.NUM_LEVELS)
        pyramid = tuple(p.at[slots].set(v.astype(p.dtype))
                        for p, v in zip(pyramid, vols))
    return nets_e, target, weight, pyramid


_add_edges_device = jax.jit(
    _add_edges_traced, static_argnames=("with_volumes",),
    donate_argnames=("nets_e", "target", "weight", "pyramid"))


@partial(jax.jit, donate_argnames=("bufs",))
def _scatter_rows(bufs, idx, values):
    """Write `values[k]` to `bufs[idx[k]]` for each buffer (idx may contain
    out-of-range sentinels, which XLA drops)."""
    return tuple(b.at[idx].set(v.astype(b.dtype)) for b, v in
                 zip(bufs, values))


def _move_rows_traced(dst_bufs, src_bufs, src_idx, dst_idx):
    """dst[dst_idx[k]] = src[src_idx[k]] (gather + scatter fused; eager
    `src[idx]` indexing would cost its own tunnel dispatch)."""
    return tuple(d.at[dst_idx].set(s[src_idx].astype(d.dtype))
                 for d, s in zip(dst_bufs, src_bufs))


_move_rows = jax.jit(_move_rows_traced, donate_argnames=("dst_bufs",))


@jax.jit
def _gather_rows(bufs, src):
    """bufs' rows reordered by `src` in one dispatch (slot compaction)."""
    return tuple(b[src] for b in bufs)


# ---------------------------------------------------------------------------


class FactorGraph:
    def __init__(self, video: DepthVideo, params, max_factors: int = -1,
                 corr_impl: str = "volume", upsample: bool = False,
                 capacity: int = 64, inactive_capacity: int = 2048,
                 ba_inactive_bucket: int = 64, rmax: int = 16, mesh=None):
        # rmax: Schur row-group bucket. The G einsum in the BA costs
        # O(rmax^2), and typical frontend out-degrees give ~6-10 actual rows
        # per depth frame; the bucket grows monotonically (one recompile)
        # when a frame exceeds it.
        self.video = video
        self.params = params
        self.max_factors = max_factors
        self.corr_impl = corr_impl
        self.upsample = upsample
        # lookup formulation: fused VPU tent multiply-reduce on accelerators
        # (ops/corr.py — measured ~2.9 ms/lookup on v5e vs ~25 ms for
        # batched-tiny-matmul tent and ~90 ms for gather; near the VPU FMA
        # roofline, see ROOFLINE.md). "dense_cm" stores the volumes
        # channel-major and feeds the corr encoder channel-major, absorbing
        # the NHWC boundary transpose into the encoder matmul (+0.9 kf/s);
        # XLA gather on CPU. Overridable via DROID_LOOKUP_IMPL.
        import os
        self.lookup_impl = os.environ.get(
            "DROID_LOOKUP_IMPL",
            "dense_cm" if jax.default_backend() != "cpu" else "gather")
        # compile-stability knobs: the fused update is keyed on these, so
        # they must NOT wobble frame-to-frame (each recompile costs ~30 s
        # over the deployment's remote-compile tunnel)
        self.ba_inactive_bucket = ba_inactive_bucket
        self.rmax = rmax
        self.window_bucket = 32  # grows monotonically (see update())
        self._lowmem_spilled_last = False  # last update_lowmem spilled?
        # edge-parallel mode (parallel/frontend.py): a jax.sharding.Mesh —
        # dispatch_update routes through the shard_map'd fused update with
        # the slot dimension sharded over it
        self.mesh = mesh

        self.h, self.w = video.h, video.w
        hw = self.h * self.w

        # host bookkeeping: per-edge (slot, i, j, age); order = reference order
        self.edges: list[list] = []          # [slot, i, j, age]
        self.free = list(range(capacity))
        self.capacity = capacity

        self.ii_inac = np.zeros(0, np.int64)
        self.jj_inac = np.zeros(0, np.int64)
        self.inac_slots = np.zeros(0, np.int64)
        self.inac_free = list(range(inactive_capacity))
        self.ii_bad = np.zeros(0, np.int64)
        self.jj_bad = np.zeros(0, np.int64)

        # single-dispatch frame path: deferred active->inactive moves and
        # deferred new-edge tables, drained by the fused frame program
        self.defer = False
        self.ae_bucket = AE_BUCKET       # sticky (compile-key stability)
        self._pending_moves: list = []   # (src_slot, dst_islot) pairs
        self._pending_add = None         # (ii_p, jj_p, c, slots_p)

        # device slot-stable state
        self.net = jnp.zeros((capacity, self.h, self.w, 128), jnp.bfloat16)
        self.target = jnp.zeros((capacity, 2, hw), jnp.float32)
        self.weight = jnp.zeros((capacity, 2, hw), jnp.float32)
        self.target_inac = jnp.zeros((inactive_capacity, 2, hw), jnp.float32)
        self.weight_inac = jnp.zeros((inactive_capacity, 2, hw), jnp.float32)

        if corr_impl == "volume":
            h2, w2 = self.h, self.w
            if self.lookup_impl == "dense_cm":
                # channel-major layout: pixels in lanes (see ops/corr.py)
                self.pyramid = tuple(
                    jnp.zeros((capacity, h2 // 2 ** l, w2 // 2 ** l, hw),
                              jnp.bfloat16) for l in range(corr_ops.NUM_LEVELS))
            else:
                self.pyramid = tuple(
                    jnp.zeros((capacity, hw, h2 // 2 ** l, w2 // 2 ** l),
                              jnp.bfloat16) for l in range(corr_ops.NUM_LEVELS))
        else:
            self.pyramid = None

    # ------------------------------------------------------------------
    @property
    def ii(self):
        return np.array([e[1] for e in self.edges], np.int64)

    @property
    def jj(self):
        return np.array([e[2] for e in self.edges], np.int64)

    @property
    def age(self):
        return np.array([e[3] for e in self.edges], np.int64)

    def _slots(self):
        return np.array([e[0] for e in self.edges], np.int64)

    # ------------------------------------------------------------------
    # add / remove (factor_graph.py:99-212)
    # ------------------------------------------------------------------

    def add_factors(self, ii, jj, remove: bool = False):
        ii = np.asarray(ii, np.int64).reshape(-1)
        jj = np.asarray(jj, np.int64).reshape(-1)

        # dedup vs active and inactive (factor_graph.py:52-68)
        existing = {(e[1], e[2]) for e in self.edges}
        existing |= set(zip(self.ii_inac.tolist(), self.jj_inac.tolist()))
        keep = [k for k in range(len(ii)) if (ii[k], jj[k]) not in existing
                and (ii[k], jj[k]) not in set(zip(ii[:k], jj[:k]))]
        ii, jj = ii[keep], jj[keep]
        if len(ii) == 0:
            return

        # cap on active factors: evict oldest (factor_graph.py:114-123)
        if (self.max_factors > 0 and len(self.edges) + len(ii) > self.max_factors
                and remove and self.edges):
            order = np.argsort(self.age, kind="stable")
            n_keep = max(self.max_factors - len(ii), 0)
            evict = set(order[n_keep:].tolist())
            self.rm_factors(np.array([k in evict for k in
                                      range(len(self.edges))]), store=True)

        while len(self.free) < len(ii):
            self._grow()

        # pad the batch of new edges to a bucket so the reprojection/volume
        # builds compile once per bucket size (recompile control, SURVEY §7.4)
        k = len(ii)
        kb = _bucket(k, (4, 8, 16, 32, 64, 128, 256, 512, 1024, 2048, 4096))
        if self.defer:
            while self.ae_bucket < kb:
                self.ae_bucket *= 2  # rare recompile of the frame program
            kb = self.ae_bucket
        ii_p = np.zeros(kb, np.int64); ii_p[:k] = ii
        jj_p = np.zeros(kb, np.int64); jj_p[:k] = jj
        slots = np.array([self.free.pop(0) for _ in range(k)], np.int64)
        slots_p = np.full(kb, self.capacity + 1, np.int64)  # pad -> dropped
        slots_p[:k] = slots
        c = (ii_p == jj_p).astype(np.int64)  # stereo edges use right view

        for n in range(k):
            self.edges.append([int(slots[n]), int(ii[n]), int(jj[n]), 0])

        if self.defer:
            assert self._pending_add is None, "one add per fused frame"
            self._pending_add = (ii_p, jj_p, c, slots_p)
            return

        buf = self.video.buf
        with_volumes = self.corr_impl == "volume"
        pyramid = self.pyramid if with_volumes else ()
        self.net, self.target, self.weight, pyramid = _add_edges_device(
            buf.poses, buf.disps, buf.intrinsics, buf.nets, buf.fmaps,
            self.net, self.target, self.weight, pyramid,
            jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(c),
            jnp.asarray(slots_p), with_volumes)
        if with_volumes:
            self.pyramid = pyramid

    def compact(self):
        """Shrink the slot buffers to the smallest bucket holding
        max(live edges, max_factors) and renumber slots densely.

        Every per-iteration GRU conv and corr-volume pass scales with the
        slot CAPACITY (slot-native formulations), so init's transient
        neighborhood graph must not pin the steady state to an oversized
        bucket: the frontend calls this once after initialization."""
        n = len(self.edges)
        floor = max(n, self.max_factors if self.max_factors > 0 else n)
        want = _bucket(floor, ACTIVE_BUCKETS)
        if want >= self.capacity:
            return
        src = np.zeros(want, np.int64)
        for k, e in enumerate(self.edges):
            src[k] = e[0]
            e[0] = k
        bufs = (self.net, self.target, self.weight) + \
            (self.pyramid if self.pyramid is not None else ())
        out = _gather_rows(bufs, jnp.asarray(src))
        self.net, self.target, self.weight = out[:3]
        if self.pyramid is not None:
            self.pyramid = tuple(out[3:])
        self.free = list(range(n, want))
        self.capacity = want

    def _grow(self):
        """Double the active-edge capacity (slot-stable)."""
        old = self.capacity
        new = _bucket(old + 1, ACTIVE_BUCKETS + (512, 1024, 2048))
        pad = new - old

        def grow(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

        self.net, self.target, self.weight = map(
            grow, (self.net, self.target, self.weight))
        if self.pyramid is not None:
            self.pyramid = tuple(map(grow, self.pyramid))
        self.free.extend(range(old, new))
        self.capacity = new

    def rm_factors(self, mask, store: bool = False):
        """factor_graph.py:154-178."""
        mask = np.asarray(mask, bool)
        removed = [e for e, m in zip(self.edges, mask) if m]
        self.edges = [e for e, m in zip(self.edges, mask) if not m]
        if not removed:
            return
        slots = np.array([e[0] for e in removed], np.int64)
        if store:
            while len(self.inac_free) < len(removed):
                self._grow_inactive()
            islots = np.array([self.inac_free.pop(0) for _ in removed],
                              np.int64)
            if self.defer:
                self._pending_moves.extend(zip(slots.tolist(),
                                               islots.tolist()))
            else:
                kb = _bucket(len(removed), (4, 8, 16, 32, 64, 128, 256, 512,
                                            1024, 2048, 4096))
                src_p = np.zeros(kb, np.int64); src_p[:len(slots)] = slots
                dst_p = np.full(kb, self.target_inac.shape[0] + 1, np.int64)
                dst_p[:len(islots)] = islots
                self.target_inac, self.weight_inac = _move_rows(
                    (self.target_inac, self.weight_inac),
                    (self.target, self.weight), src_p, dst_p)
            self.ii_inac = np.concatenate(
                [self.ii_inac, [e[1] for e in removed]]).astype(np.int64)
            self.jj_inac = np.concatenate(
                [self.jj_inac, [e[2] for e in removed]]).astype(np.int64)
            self.inac_slots = np.concatenate([self.inac_slots, islots])
        self.free.extend(slots.tolist())

    def _grow_inactive(self):
        old = self.target_inac.shape[0]
        pad = old  # double

        def grow(x):
            return jnp.concatenate(
                [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)

        self.target_inac = grow(self.target_inac)
        self.weight_inac = grow(self.weight_inac)
        self.inac_free.extend(range(old, old + pad))

    def rm_keyframe(self, ix: int):
        """factor_graph.py:182-212: shift video buffers down and reindex."""
        self.video.rm_keyframe(ix)

        m = (self.ii_inac == ix) | (self.jj_inac == ix)
        self.ii_inac = np.where(self.ii_inac >= ix, self.ii_inac - 1,
                                self.ii_inac)
        self.jj_inac = np.where(self.jj_inac >= ix, self.jj_inac - 1,
                                self.jj_inac)
        if m.any():
            self.inac_free.extend(self.inac_slots[m].tolist())
            self.ii_inac = self.ii_inac[~m]
            self.jj_inac = self.jj_inac[~m]
            self.inac_slots = self.inac_slots[~m]

        drop = np.zeros(len(self.edges), bool)
        for k, e in enumerate(self.edges):
            if e[1] == ix or e[2] == ix:
                drop[k] = True
            if e[1] >= ix:
                e[1] -= 1
            if e[2] >= ix:
                e[2] -= 1
        self.rm_factors(drop, store=False)

    def filter_edges(self):
        """Remove low-confidence long-range edges (factor_graph.py:84-91)."""
        if not self.edges:
            return
        slots = jnp.asarray(self._slots())
        conf = np.asarray(jnp.mean(self.weight[slots], axis=(1, 2)))
        ii, jj = self.ii, self.jj
        mask = (np.abs(ii - jj) > 2) & (conf < 0.001)
        self.ii_bad = np.concatenate([self.ii_bad, ii[mask]])
        self.jj_bad = np.concatenate([self.jj_bad, jj[mask]])
        self.rm_factors(mask, store=False)

    def clear_edges(self):
        self.rm_factors(np.ones(len(self.edges), bool), store=False)

    # ------------------------------------------------------------------
    # update operator + DBA (factor_graph.py:215-263)
    # ------------------------------------------------------------------

    def update(self, t0=None, t1=None, itrs=2, use_inactive=False, EP=1e-7,
               motion_only=False, n_iters=1, kf_pair=None, kf_beta=0.3,
               next_state_t1=None, motion_damping=0.0, n_iters2=0,
               kf_thresh=-1.0, sens_frame=None):
        """Run n_iters x (GRU update + DBA(itrs)) as ONE fused device
        dispatch (factor_graph.py:215-263 semantics per iteration).

        kf_pair: optional (i, j) to also return the post-update frame
        distance (the frontend's keyframe test, droid_frontend.py:94-98)."""
        if not self.edges:
            return
        tb = self.update_tables(t0, t1, itrs=itrs,
                                use_inactive=use_inactive,
                                motion_only=motion_only, kf_pair=kf_pair,
                                next_state_t1=next_state_t1,
                                sens_frame=sens_frame)
        kf_dist = self.dispatch_update(
            tb, n_iters=n_iters, kf_beta=kf_beta,
            do_next_state=0 if next_state_t1 is None else 1,
            motion_damping=motion_damping, n_iters2=n_iters2,
            kf_thresh=kf_thresh)
        if kf_pair is not None:
            return kf_dist
        return None

    def dispatch_update(self, tb, n_iters=1, kf_beta=0.3, do_next_state=0,
                        motion_damping=0.0, n_iters2=0, kf_thresh=-1.0):
        """Device half of `update`: dispatch one fused update from prebuilt
        tables and apply the results (standalone / fallback path). With
        `self.mesh` set the same program runs shard_map'd with the slot
        dimension sharded over the mesh (parallel/frontend.py)."""
        buf = self.video.buf
        if self.mesh is not None:
            from ..parallel.frontend import fused_update_mesh
            (poses, disps, damping, self.net, self.target, self.weight, eta,
             upmask, disps_up, kf_dist) = fused_update_mesh(
                self.mesh, "edges",
                self.params, buf.poses, buf.disps, buf.disps_sens,
                buf.damping, buf.intrinsics, buf.inps, self.pyramid,
                self.net, self.target, self.weight, self.target_inac,
                self.weight_inac, tb["packed"], tb["nw"], tb["EA"],
                self.lookup_impl, tb["ba_shape"], 1e-4, 0.1,
                np.int32(n_iters), self.upsample, np.float32(kf_beta),
                np.int32(do_next_state), np.float32(motion_damping),
                np.int32(n_iters2), np.float32(kf_thresh))
        else:
            (poses, disps, damping, self.net, self.target, self.weight, eta,
             upmask, disps_up, kf_dist) = _fused_update(
                self.params, buf.poses, buf.disps, buf.disps_sens,
                buf.damping,
                buf.intrinsics, buf.inps, self.pyramid, self.net,
                self.target,
                self.weight, self.target_inac, self.weight_inac,
                tb["packed"], tb["nw"], tb["EA"], self.lookup_impl,
                tb["ba_shape"], 1e-4, 0.1, np.int32(n_iters),
                self.upsample, np.float32(kf_beta),
                np.int32(do_next_state),
                np.float32(motion_damping),
                np.int32(n_iters2),
                np.float32(kf_thresh))
        self.video.buf = buf._replace(poses=poses, disps=disps,
                                      damping=damping)

        if self.upsample and disps_up is not None:
            uframes = np.unique(self.ii)
            self.video.set_disps_up(jnp.asarray(uframes),
                                    disps_up[jnp.asarray(uframes - tb["g0"])])

        for e in self.edges:
            e[3] += n_iters
        return kf_dist

    def up_dst_table(self, tb):
        """Scatter destinations for the fused frame program's upsampled
        disparities: disps_up row k -> video frame g0+k for frames in the
        current edge set, sentinel (dropped) otherwise."""
        nw = tb["nw"]
        g0 = tb["g0"]
        dst = np.full(nw, self.video.buffer + 1, np.int64)
        for f in np.unique(self.ii):
            if 0 <= f - g0 < nw:
                dst[f - g0] = f
        return dst

    def update_tables(self, t0=None, t1=None, itrs=2, use_inactive=False,
                      motion_only=False, kf_pair=None, next_state_t1=None,
                      sens_frame=None):
        """Host half of `update`: the packed index tables + static compile
        keys for one fused update dispatch (shared by the standalone path
        and the single-dispatch frame program)."""
        ii, jj = self.ii, self.jj
        # EA == slot capacity: a FIXED bucket so the fused program's compile
        # key stays stable frame-to-frame
        EA = self.capacity

        if t0 is None:
            t0 = max(1, int(ii.min()) + 1)
        if t1 is None:
            t1 = int(max(ii.max(), jj.max())) + 1

        g0 = int(min(ii.min(), jj.min(), t0 - 1))

        # SLOT-ORDERED active tables: row s describes the edge living in
        # slot s (valid_s marks occupied slots). The update core then runs
        # slot-native — nets_e[slots] gathers, result scatters and the corr
        # coords shuffle all become identities and vanish from the program.
        ii_s = np.zeros(EA, np.int64)
        jj_s = np.zeros(EA, np.int64)
        valid_s = np.zeros(EA, np.int64)
        for s, i, j, _age in self.edges:
            ii_s[s] = i
            jj_s[s] = j
            valid_s[s] = 1
        # pinned window bucket: grows monotonically, never shrinks, so the
        # fused program's compile key stays put as the video extends
        self.window_bucket = max(self.window_bucket,
                                 _bucket(t1 - g0, WINDOW_BUCKETS))
        nw = self.window_bucket

        # BA edge set: inactive edges padded to a FIXED bucket, then the
        # padded active bucket (fg.py:240-248); the plan is built for this
        # exact layout so plan rows align with the device arrays
        if use_inactive and len(self.ii_inac):
            m = (self.ii_inac >= t0 - 3) & (self.jj_inac >= t0 - 3)
            ii_inac, jj_inac = self.ii_inac[m], self.jj_inac[m]
            in_slots = self.inac_slots[m]
        else:
            ii_inac = np.zeros(0, np.int64)
            jj_inac = np.zeros(0, np.int64)
            in_slots = np.zeros(0, np.int64)

        while len(ii_inac) > self.ba_inactive_bucket:
            self.ba_inactive_bucket *= 2  # rare recompile
        IB = self.ba_inactive_bucket
        in_slots_p = np.zeros(IB, np.int64)
        in_slots_p[:len(in_slots)] = in_slots

        # active rows in SLOT order so plan row IB+s aligns with the
        # slot-native device arrays
        ii_full = np.concatenate(
            [ii_inac, np.full(IB - len(ii_inac), t0),
             np.where(valid_s > 0, ii_s, t0)])
        jj_full = np.concatenate(
            [jj_inac, np.full(IB - len(jj_inac), t0),
             np.where(valid_s > 0, jj_s, t0)])
        valid_full = np.concatenate(
            [np.ones(len(ii_inac), bool), np.zeros(IB - len(ii_inac), bool),
             valid_s > 0])
        ba_shape, ba_plan = ba_inference.build_plan(
            ii_full, jj_full, t0, t1, iters=itrs, motion_only=motion_only,
            valid=valid_full, edges=IB + EA, rmax=self.rmax,
            window=self.window_bucket)
        self.window_bucket = max(self.window_bucket, ba_shape.window)
        self.rmax = max(self.rmax, ba_shape.rmax)  # sticky compile key

        kf = (0, 0) if kf_pair is None else kf_pair
        packed = _pack_indices(
            ba_plan.ii, ba_plan.jj, ba_plan.edge_valid, ba_plan.k_valid,
            ba_plan.row_pose, ba_plan.row_depth, ba_plan.rk_idx,
            [int(ba_plan.g0)], [int(ba_plan.t0)], [int(ba_plan.t1)],
            np.arange(EA), ii_s, jj_s,
            valid_s.astype(np.int32), in_slots_p,
            np.asarray(kf, np.int32), [g0],
            [0 if next_state_t1 is None else int(next_state_t1)],
            [-1 if sens_frame is None else int(sens_frame)])

        return dict(packed=packed, ba_shape=ba_shape, nw=nw, EA=EA, g0=g0)

    def bump_age(self, n):
        """Account iterations that ran conditionally on-device."""
        for e in self.edges:
            e[3] += n

    # ------------------------------------------------------------------
    # single-dispatch frame path plumbing
    # ------------------------------------------------------------------

    def drain_deferred(self):
        """Padded (mv_src, mv_dst, ae_ii, ae_jj, ae_c, ae_slots) tables for
        the fused frame program; clears the pending state."""
        mv_src = np.full(self.capacity, self.capacity + 1, np.int64)
        mv_dst = np.full(self.capacity, self.target_inac.shape[0] + 1,
                         np.int64)
        for n, (s, d) in enumerate(self._pending_moves):
            mv_src[n] = s
            mv_dst[n] = d
        self._pending_moves = []
        if self._pending_add is None:
            kb = self.ae_bucket
            ae_ii = np.zeros(kb, np.int64)
            ae_jj = np.zeros(kb, np.int64)
            ae_c = np.zeros(kb, np.int64)
            ae_slots = np.full(kb, self.capacity + 1, np.int64)
        else:
            ae_ii, ae_jj, ae_c, ae_slots = self._pending_add
            self._pending_add = None
        return mv_src, mv_dst, ae_ii, ae_jj, ae_c, ae_slots

    def flush_deferred(self):
        """Eagerly dispatch any deferred moves/adds (fallback path)."""
        if self._pending_moves:
            src = np.array([s for s, _ in self._pending_moves], np.int64)
            dst = np.array([d for _, d in self._pending_moves], np.int64)
            self._pending_moves = []
            kb = _bucket(len(src), (4, 8, 16, 32, 64, 128, 256, 512, 1024,
                                    2048, 4096))
            src_p = np.zeros(kb, np.int64); src_p[:len(src)] = src
            dst_p = np.full(kb, self.target_inac.shape[0] + 1, np.int64)
            dst_p[:len(dst)] = dst
            self.target_inac, self.weight_inac = _move_rows(
                (self.target_inac, self.weight_inac),
                (self.target, self.weight), src_p, dst_p)
        if self._pending_add is not None:
            ii_p, jj_p, c, slots_p = self._pending_add
            self._pending_add = None
            buf = self.video.buf
            with_volumes = self.corr_impl == "volume"
            pyramid = self.pyramid if with_volumes else ()
            self.net, self.target, self.weight, pyramid = _add_edges_device(
                buf.poses, buf.disps, buf.intrinsics, buf.nets, buf.fmaps,
                self.net, self.target, self.weight, pyramid,
                jnp.asarray(ii_p), jnp.asarray(jj_p), jnp.asarray(c),
                jnp.asarray(slots_p), with_volumes)
            if with_volumes:
                self.pyramid = pyramid

    # ------------------------------------------------------------------
    # reduced-memory global update (factor_graph.py:267-330)
    # ------------------------------------------------------------------

    def update_lowmem(self, t0=None, t1=None, itrs=2, use_inactive=False,
                      EP=1e-7, steps=8):
        """Global BA loop with on-the-fly (alt) correlation, chunked over
        groups of 8 source frames to bound the GRU working set.

        Every step (chunk sweep + BA, with optional convex upsampling) is a
        single fused dispatch. Above a device-memory threshold the per-edge
        GRU state is host-spilled between chunk sweeps (see
        _lowmem_steps_unified), and a device memory-pressure failure
        triggers one retry with spilling forced on — buffer=1000 presets
        degrade in software instead of crashing (VERDICT r4 weak #4)."""
        t = self.video.counter
        buf = self.video.buf
        B, c = buf.fmaps.shape[:2]
        # flatten the rig dim: frame n, camera k -> row n*c + k
        fpyr = corr_ops.build_fmap_pyramid(
            buf.fmaps.reshape(B * c, self.h, self.w, 128))
        try:
            self._update_lowmem_fused(fpyr, t, itrs, use_inactive, steps)
            return
        except Exception as e:  # noqa: BLE001 - matched below, else re-raised
            msg = f"{type(e).__name__}: {e}"
            pressure = any(s in msg for s in (
                "RESOURCE_EXHAUSTED", "RESOURCE EXHAUSTED", "Out of memory",
                "UNAVAILABLE"))
            if not pressure or self._lowmem_spilled_last:
                raise
            print(f"update_lowmem: device memory pressure ({msg[:120]}...); "
                  f"retrying with host-spilled edge state", flush=True)
        self._update_lowmem_fused(fpyr, t, itrs, use_inactive, steps,
                                  force_spill=True)

    # per-chunk edge-count size classes for the sweep (the scan pads every
    # chunk to its class's CE — classing bounds the padding waste, where a
    # single global CE bucket paid max-chunk padding on EVERY chunk:
    # measured 10-16x padded/real edge ratios at t>=500, the round-4
    # "memory wall" and most of its 30.9 s/step)
    _LOWMEM_CE_CLASSES = (32, 128, 512, 2048)

    def _update_lowmem_fused(self, fpyr, t, itrs, use_inactive, steps,
                             force_spill=None):
        """Few-dispatches-per-step global BA (chunk tables built once):
        one _lowmem_sweep_group dispatch per chunk size class + one
        _lowmem_ba_step, with the BA system packed DENSELY over the real
        edges (not the padded chunk grid)."""
        ii, jj = self.ii, self.jj
        slots = self._slots()
        B, c = self.video.buf.fmaps.shape[:2]
        i_min, i_max = int(ii.min()), int(jj.max())

        starts = list(range(i_min, i_max + 1, 8))
        chunks = [np.nonzero((ii >= i) & (ii < i + 8))[0] for i in starts]
        starts = [s for s, v in zip(starts, chunks) if len(v)]
        chunks = [v for v in chunks if len(v)]

        jj_rows = jj * c + (ii == jj).astype(np.int64)
        ii_rows = ii * c

        # inactive block of the BA system
        if use_inactive and len(self.ii_inac):
            ii_inac, jj_inac = self.ii_inac, self.jj_inac
            in_slots = self.inac_slots
        else:
            ii_inac = np.zeros(0, np.int64)
            jj_inac = np.zeros(0, np.int64)
            in_slots = np.zeros(0, np.int64)
        while len(ii_inac) > self.ba_inactive_bucket:
            self.ba_inactive_bucket *= 2
        IB = self.ba_inactive_bucket
        in_slots_p = np.zeros(IB, np.int64)
        in_slots_p[:len(in_slots)] = in_slots

        # chunk-parallel path: with a device mesh (DroidConfig
        # edge_parallel=N) the sweep shards over the chunk dim — each chip
        # holds NC/n chunks' edge state (parallel/backend.py). Its packed
        # [NC,CE] layout IS the sharded state, so it keeps the single-CE
        # chunk grid and a grid-ordered BA plan.
        if self.mesh is not None and not self.upsample:
            NC = _bucket(len(chunks), (2, 4, 8, 16, 32, 64, 128))
            CE = _bucket(max(len(v) for v in chunks),
                         (32, 64, 128, 256, 512, 1024))
            c_slots = np.zeros((NC, CE), np.int64)
            c_ii = np.zeros((NC, CE), np.int64)
            c_jj = np.zeros((NC, CE), np.int64)
            c_iir = np.zeros((NC, CE), np.int64)
            c_jjr = np.zeros((NC, CE), np.int64)
            c_valid = np.zeros((NC, CE), bool)
            c_g0 = np.full(NC, i_min, np.int64)
            ii_flat = np.full(NC * CE, 1, np.int64)
            jj_flat = np.full(NC * CE, 1, np.int64)
            for k, (s, v) in enumerate(zip(starts, chunks)):
                n = len(v)
                c_slots[k, :n] = slots[v]
                c_ii[k, :n] = ii[v]
                c_jj[k, :n] = jj[v]
                c_iir[k, :n] = ii_rows[v]
                c_jjr[k, :n] = jj_rows[v]
                c_valid[k, :n] = True
                c_g0[k] = s
                ii_flat[k * CE:k * CE + n] = ii[v]
                jj_flat[k * CE:k * CE + n] = jj[v]
            ii_full = np.concatenate(
                [ii_inac, np.full(IB - len(ii_inac), 1), ii_flat])
            jj_full = np.concatenate(
                [jj_inac, np.full(IB - len(jj_inac), 1), jj_flat])
            valid_full = np.concatenate(
                [np.ones(len(ii_inac), bool),
                 np.zeros(IB - len(ii_inac), bool), c_valid.reshape(-1)])
            ba_shape, ba_plan = ba_inference.build_plan(
                ii_full, jj_full, 1, t, iters=itrs, valid=valid_full,
                edges=IB + NC * CE, rmax=self.rmax)
            self._lowmem_spilled_last = False
            self._lowmem_steps_mesh(
                fpyr, t, steps, CE, c_slots, c_ii, c_jj, c_iir, c_jjr,
                c_valid, c_g0, ba_shape, ba_plan, in_slots_p)
            return

        # dense BA plan: real edges only, padded to an edge bucket (the
        # chunk-grid layout would pad to NC*CE rows — 16x the real edge
        # count at t=1000 — and every BA-side per-edge array with it)
        n_real = len(ii)
        EBA = _bucket(max(n_real, 1), (64, 128, 256, 512, 1024, 2048,
                                       4096, 8192, 16384, 32768))
        ii_p = np.full(EBA, 1, np.int64)
        jj_p = np.full(EBA, 1, np.int64)
        ii_p[:n_real] = ii
        jj_p[:n_real] = jj
        act_slots = np.zeros(EBA, np.int64)
        act_slots[:n_real] = slots
        ii_full = np.concatenate(
            [ii_inac, np.full(IB - len(ii_inac), 1), ii_p])
        jj_full = np.concatenate(
            [jj_inac, np.full(IB - len(jj_inac), 1), jj_p])
        valid_full = np.concatenate(
            [np.ones(len(ii_inac), bool), np.zeros(IB - len(ii_inac), bool),
             np.ones(n_real, bool), np.zeros(EBA - n_real, bool)])
        ba_shape, ba_plan = ba_inference.build_plan(
            ii_full, jj_full, 1, t, iters=itrs, valid=valid_full,
            edges=IB + EBA, rmax=self.rmax)

        # spill decision: stream the per-edge GRU state host<->device when
        # it cannot stay resident next to the sweep/BA transients
        mode, thresh_gb, group_gb, resident_gb = _lowmem_spill_cfg()
        row_bytes = int(np.prod(self.net.shape[1:])) * self.net.dtype.itemsize
        nets_bytes = self.capacity * row_bytes
        if force_spill is not None:
            spill = force_spill
            if force_spill:
                resident_gb = 0.0  # pressure retry: stream EVERYTHING
        elif mode in ("0", "1"):
            spill = mode == "1"
        else:
            spill = nets_bytes > thresh_gb * 2**30
        self._lowmem_spilled_last = spill

        groups = self._lowmem_make_groups(
            chunks, starts, slots, ii, jj, ii_rows, jj_rows, spill,
            max(256, int(group_gb * 2**30) // row_bytes))
        if spill:
            # hybrid residency: keep as many groups device-resident as the
            # budget allows; only the overflow streams host<->device
            acc = 0
            for gt in groups:
                sz = gt["RG"] * row_bytes
                gt["resident"] = acc + sz <= resident_gb * 2**30
                if gt["resident"]:
                    acc += sz
        self._lowmem_steps_unified(fpyr, t, steps, groups, ba_shape,
                                   ba_plan, in_slots_p, act_slots, spill)

    def _lowmem_make_groups(self, chunks, starts, slots, ii, jj, ii_rows,
                            jj_rows, spill, budget_rows):
        """Partition chunks into sweep groups and build their device
        tables. Chunks are first split by edge-count size class (each class
        compiles one scan with its own CE — bounds padding waste), then,
        when spilling, by the packed-row budget."""
        dev = jnp.asarray
        classed = {}
        for k, v in enumerate(chunks):
            ce = _bucket(len(v), self._LOWMEM_CE_CLASSES)
            classed.setdefault(ce, []).append(k)

        raw_groups = []
        for ce, ks in sorted(classed.items()):
            if not spill:
                raw_groups.append((ce, ks))
                continue
            cur, rows = [], 0
            for k in ks:
                n = len(chunks[k])
                if cur and rows + n > budget_rows:
                    raw_groups.append((ce, cur))
                    cur, rows = [], 0
                cur.append(k)
                rows += n
            if cur:
                raw_groups.append((ce, cur))

        NG_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)
        RG_BUCKETS = (256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536)
        groups = []
        for ce, ks in raw_groups:
            ngc = _bucket(len(ks), NG_BUCKETS)
            rows_g = sum(len(chunks[k]) for k in ks)
            g_slots = np.zeros((ngc, ce), np.int64)
            g_lslot = np.zeros((ngc, ce), np.int64)
            g_ii = np.zeros((ngc, ce), np.int64)
            g_jj = np.zeros((ngc, ce), np.int64)
            g_iir = np.zeros((ngc, ce), np.int64)
            g_jjr = np.zeros((ngc, ce), np.int64)
            g_valid = np.zeros((ngc, ce), bool)
            g_g0 = np.full(ngc, starts[ks[0]], np.int64)
            RG = _bucket(rows_g, RG_BUCKETS) if spill else 0
            order = np.zeros(max(RG, 1), np.int64)
            base = 0
            for kk, k in enumerate(ks):
                v = chunks[k]
                n = len(v)
                g_slots[kk, :n] = slots[v]
                g_ii[kk, :n] = ii[v]
                g_jj[kk, :n] = jj[v]
                g_iir[kk, :n] = ii_rows[v]
                g_jjr[kk, :n] = jj_rows[v]
                g_valid[kk, :n] = True
                g_g0[kk] = starts[k]
                if spill:
                    g_lslot[kk, :n] = base + np.arange(n)
                    order[base:base + n] = slots[v]
                base += n
            if not spill:
                # resident: the "local" nets rows ARE the cap-wide slots
                g_lslot = g_slots
            groups.append(dict(
                rows=rows_g, RG=RG, order=order,
                slots=dev(g_slots), lslot=dev(g_lslot), ii=dev(g_ii),
                jj=dev(g_jj), iir=dev(g_iir), jjr=dev(g_jjr),
                valid=dev(g_valid), g0=dev(g_g0)))
        return groups

    def _lowmem_steps_unified(self, fpyr, t, steps, groups, ba_shape,
                              ba_plan, in_slots_p, act_slots, spill):
        """Run the global-BA steps over prebuilt sweep groups.

        Resident: the GRU state stays in the cap-wide self.net buffer,
        threaded (donated) through each group's sweep. Spilled: each
        group's packed rows are streamed host->device before its sweep and
        back after (async copies overlap the next group's sweep), so the
        full edge state never resides on device at once — the single-chip
        answer to the reference's 24 GB-GPU global-BA footprint
        (/root/reference/droid_slam/factor_graph.py:267-330 at
        test_tartanair.py buffer=1000 scale)."""
        dev = jnp.asarray
        host_nets = None
        if spill:
            # packed per-group state: resident groups keep a DEVICE buffer
            # across steps (zero steady-state transfers); streamed groups
            # keep a host copy and round-trip each step
            host_nets = []
            for gt in groups:
                rows_dev = _gather_rows((self.net,), dev(gt["order"]))[0]
                if gt.get("resident"):
                    host_nets.append(rows_dev)
                else:
                    host_nets.append(np.asarray(rows_dev))
                    del rows_dev
            cap_shape = self.net.shape
            cap_dtype = self.net.dtype
            self.net = None

        act_slots_d = dev(np.clip(act_slots, 0, self.capacity - 1))
        in_slots_d = dev(in_slots_p)
        for _ in range(steps):
            buf = self.video.buf
            target, weight = self.target, self.weight
            damping, disps_up = buf.damping, buf.disps_up
            pending = []
            for gi, gt in enumerate(groups):
                if not spill:
                    nets_in = self.net
                elif gt.get("resident"):
                    nets_in = host_nets[gi]
                else:
                    nets_in = jax.device_put(host_nets[gi])
                (nets_out, target, weight, damping,
                 disps_up) = _lowmem_sweep_group(
                    self.params, buf.poses, buf.disps, buf.intrinsics,
                    buf.inps, fpyr, nets_in, target, weight, damping,
                    disps_up, gt["slots"], gt["lslot"], gt["ii"], gt["jj"],
                    gt["iir"], gt["jjr"], gt["valid"], gt["g0"],
                    upsample=self.upsample)
                if not spill:
                    self.net = nets_out
                elif gt.get("resident"):
                    host_nets[gi] = nets_out
                else:
                    try:
                        nets_out.copy_to_host_async()
                    except Exception:
                        pass
                    pending.append((gi, nets_out))
            self.target, self.weight = target, weight
            poses, disps = _lowmem_ba_step(
                buf.poses, buf.disps, buf.disps_sens, damping,
                buf.intrinsics, target, weight, self.target_inac,
                self.weight_inac, in_slots_d, act_slots_d, ba_shape,
                ba_plan, 1e-5, 1e-2)
            for gi, dn in pending:
                host_nets[gi] = np.asarray(dn)
                del dn
            self.video.buf = buf._replace(poses=poses, disps=disps,
                                          damping=damping,
                                          disps_up=disps_up)
            for e in self.edges:
                e[3] += 1

        if spill:
            # reconstitute the cap-wide edge state HOST-side (it may not
            # fit on device — that is why we spilled); later device
            # consumers get an implicit transfer, and the sync backend
            # discards the graph right after terminate.
            net_host = np.zeros(cap_shape, cap_dtype)
            for gi, gt in enumerate(groups):
                n = gt["rows"]
                net_host[gt["order"][:n]] = np.asarray(host_nets[gi])[:n]
            self.net = net_host
        self.video.dirty[:t] = True

    def _lowmem_steps_mesh(self, fpyr, t, steps, CE, c_slots, c_ii, c_jj,
                           c_iir, c_jjr, c_valid, c_g0, ba_shape, ba_plan,
                           in_slots_p):
        """Global-BA steps with the chunk sweep sharded over self.mesh
        (parallel/backend.py::lowmem_step_mesh). Edge state is repacked
        chunk-major [NC,CE,...] and sharded on the chunk dim for the run,
        then scattered back into the slot buffers."""
        from ..parallel import backend as pbackend

        dev = jnp.asarray
        cap = self.capacity
        n = self.mesh.devices.size
        NC = c_slots.shape[0]
        if NC % n:
            # pad with no-op chunks (valid=False) so NC shards evenly
            pad = n - NC % n
            zpad = lambda a, fill=0: np.concatenate(
                [a, np.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)
            c_slots, c_ii, c_jj, c_iir, c_jjr = map(
                zpad, (c_slots, c_ii, c_jj, c_iir, c_jjr))
            c_valid = zpad(c_valid, False)
            c_g0 = zpad(c_g0, int(c_g0[0]))
            NC += pad
        flat = dev(np.clip(c_slots.reshape(-1), 0, cap - 1))
        nets_c, target_c, weight_c = _gather_rows(
            (self.net, self.target, self.weight), flat)
        sc = lambda x: pbackend.shard_chunks(self.mesh, x)
        nets_c = sc(nets_c.reshape((NC, CE) + nets_c.shape[1:]))
        target_c = sc(target_c.reshape((NC, CE) + target_c.shape[1:]))
        weight_c = sc(weight_c.reshape((NC, CE) + weight_c.shape[1:]))
        tabs = sc((dev(c_ii), dev(c_jj), dev(c_iir), dev(c_jjr),
                   dev(c_valid), dev(c_g0)))
        in_slots_d = dev(in_slots_p)

        for _ in range(steps):
            buf = self.video.buf
            (poses, disps, damping, nets_c, target_c,
             weight_c) = pbackend.lowmem_step_mesh(
                self.mesh, "edges", self.params, buf.poses, buf.disps,
                buf.disps_sens, buf.damping, buf.intrinsics, buf.inps,
                fpyr, nets_c, target_c, weight_c, *tabs,
                self.target_inac, self.weight_inac, in_slots_d,
                ba_shape, ba_plan, jnp.float32(1e-5), jnp.float32(1e-2))
            self.video.buf = buf._replace(poses=poses, disps=disps,
                                          damping=damping)
            for e in self.edges:
                e[3] += 1

        # scatter the packed edge state back into the slot buffers
        wsl = dev(np.where(c_valid.reshape(-1), c_slots.reshape(-1),
                           cap + 1))
        self.net, self.target, self.weight = _scatter_rows(
            (self.net, self.target, self.weight), wsl,
            (nets_c.reshape((-1,) + nets_c.shape[2:]),
             target_c.reshape((-1,) + target_c.shape[2:]),
             weight_c.reshape((-1,) + weight_c.shape[2:])))
        self.video.dirty[:t] = True

    # ------------------------------------------------------------------
    # edge proposers (factor_graph.py:332-412)
    # ------------------------------------------------------------------

    def add_neighborhood_factors(self, t0, t1, r=3):
        ii, jj = np.meshgrid(np.arange(t0, t1), np.arange(t0, t1),
                             indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)
        c = 1 if self.video.stereo else 0
        keep = (np.abs(ii - jj) > c) & (np.abs(ii - jj) <= r)
        self.add_factors(ii[keep], jj[keep])

    def add_proximity_factors(self, t0=0, t1=0, rad=2, nms=2, beta=0.25,
                              thresh=16.0, remove=False, dist=None):
        t = self.video.counter
        ix = np.arange(t0, t)
        jx = np.arange(t1, t)
        if len(ix) == 0 or len(jx) == 0:
            return
        ii, jj = np.meshgrid(ix, jx, indexing="ij")
        ii, jj = ii.reshape(-1), jj.reshape(-1)

        if dist is not None and len(dist) == len(ii):
            d = np.asarray(dist, np.float64)  # precomputed (speculative)
        else:
            d = np.asarray(self.video.distance(ii, jj,
                                               beta=beta)).astype(np.float64)

        # native greedy NMS proposer (droid_slam_tpu/native/plan_builder.cpp)
        from .. import native
        ii1 = np.concatenate([self.ii, self.ii_bad, self.ii_inac])
        jj1 = np.concatenate([self.jj, self.jj_bad, self.jj_inac])
        es_native = native.proximity_edges(
            d.copy(), t0, t1, t, rad, nms, thresh, self.max_factors,
            self.video.stereo, ii1, jj1)
        if es_native is not None:
            if len(es_native):
                self.add_factors(es_native[:, 0], es_native[:, 1], remove)
            return

        # ---- python fallback (factor_graph.py:346-412) -------------------
        d[ii - rad < jj] = np.inf
        d[d > 100] = np.inf

        def suppress(i, j):
            n = max(min(abs(i - j) - 2, nms), 0)
            for di in range(-nms, nms + 1):
                for dj in range(-nms, nms + 1):
                    if abs(di) + abs(dj) <= n:
                        i1, j1 = i + di, j + dj
                        if t0 <= i1 < t and t1 <= j1 < t:
                            d[(i1 - t0) * (t - t1) + (j1 - t1)] = np.inf

        for i, j in zip(ii1, jj1):
            suppress(int(i), int(j))

        es = []
        for i in range(t0, t):
            if self.video.stereo:
                es.append((i, i))
                d[(i - t0) * (t - t1) + (i - t1)] = np.inf
            for j in range(max(i - rad - 1, 0), i):
                es.append((i, j))
                es.append((j, i))
                if t1 <= j < t:
                    d[(i - t0) * (t - t1) + (j - t1)] = np.inf

        for k in np.argsort(d, kind="stable"):
            if d[k] > thresh:
                continue
            if self.max_factors > 0 and len(es) > self.max_factors:
                break
            i, j = int(ii[k]), int(jj[k])
            es.append((i, j))
            es.append((j, i))
            suppress(i, j)

        if es:
            es = np.asarray(es, np.int64)
            self.add_factors(es[:, 0], es[:, 1], remove)
