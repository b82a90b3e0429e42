"""Inference-time dense bundle adjustment as static-shape on-device linear algebra.

TPU re-architecture of ba_cuda (/root/reference/src/droid_kernels.cu:1323-1443).
The reference assembles a sparse pose system on the host and solves it with
Eigen's fp64 CPU Cholesky every Gauss-Newton iteration — a GPU->CPU->GPU round
trip per iteration (SURVEY.md §3.1). Here the whole iteration (linearize ->
Hessian assembly -> Schur complement -> blocked Cholesky -> retraction) is one
jitted XLA program; window sizes, edge counts and Schur row groups are padded
to static buckets so the program compiles once per bucket.

Math parity with ba_cuda:
  * depth variables for kx = unique(ii ∪ [t0,t1)) — realized as the contiguous
    window [g0, g0+NW) with a validity mask (kx is contiguous in practice).
  * Schur trick: S = E Q E^T grouped by depth frame; rows are the per-frame
    accumulated Eii rows plus per-edge Eij rows with pose jj
    (droid_kernels.cu:1231-1320). Rows whose pose is outside [t0,t1) drop out.
  * RGB-D prior: C += m*alpha, w -= m*alpha*(d - d_sens), alpha=0.05
    (droid_kernels.cu:1404-1408); eta damping applied where no sensor.
  * damping diag += ep + lm*diag applied AFTER the Schur subtraction
    (droid_kernels.cu:1201-1222) — differs from the training path.
  * retraction: poses[t0:t1] <- exp(dx) ∘ pose; disps[kx] += dz; final
    clamp disps >= 0.001 (depth_video.py:226).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..lie import se3
from . import edge_terms
from .solver import solve_psd

ALPHA = 0.05  # depth-sensor prior weight (droid_kernels.cu:1405)
_SCHUR_CHUNK = 8
# window size from which the pose grid goes flat-lane + fori_loop
# (global-BA scale; see _scatter_pose_mat_flat). Module-level for tests.
_BIG_NW = 256

# Disparity ceiling applied together with the reference's 0.001 floor at the
# end of every BA call. The reference has no ceiling (depth_video.py:226),
# but on degenerate input (no-parallax texture shifts) disps run away
# (2e10 observed on the bench scene) and the next BA's fp32 Hessian assembly
# squares them into overflow -> NaN. 1e6x the normalized scene scale is far
# beyond any physical scene; it only engages where the reference would NaN.
# Frozen at import (baked into traced programs, not a jit cache key); tests
# monkeypatch the constant.
_DISP_MAX = float(__import__("os").environ.get("DROID_DISP_MAX", "1e6"))


def _schur_assembly() -> str:
    """Schur S-matrix assembly formulation: "scatter" (segment-sum, default)
    or "proj" (scatter-free one-hot contraction).

    Measured on v5e (round 3): scatter 17.8 kf/s end-to-end vs proj 15.1-15.7
    (both a batched P^T G P einsum and a flat [2048,1024]x[2048,36] one-hot
    matmul lose — XLA's scatter emitter beats any dense reformulation at
    these sizes, unlike the corr lookup where the dense tent wins). Kept for
    A/B because the tradeoff may flip at other window/rmax buckets."""
    import os
    return os.environ.get("DROID_SCHUR_ASSEMBLY", "scatter")


# Edge-chunk size for the Gauss-Newton linearization (global-BA scale, see
# ba_iterations): bounds the per-edge pixel transients to
# chunk x HW x ~80 bytes. 2048 x 1200 px ~= 200 MB peak per chunk.
# Frozen at import (like nets._GRU_QFUSE): the value is baked into traced
# programs and is NOT part of any jit cache key, so changing the env after
# first compile would silently do nothing. Tests monkeypatch the constant.
_BA_EDGE_CHUNK = int(
    __import__("os").environ.get("DROID_BA_EDGE_CHUNK", "2048"))


def _ba_edge_chunk() -> int:
    return _BA_EDGE_CHUNK


def _evt_quirk() -> bool:
    """Whether to reproduce the reference's EvT6x1 `idx <= 0` skip
    (droid_kernels.cu:1116-1117) in the depth back-substitution."""
    import os
    return os.environ.get("DROID_REF_EVT_QUIRK", "1") != "0"


class BAShape(NamedTuple):
    """Static bucket sizes — the jit compile key."""
    edges: int
    window: int  # NW: padded size of the contiguous pose/depth window
    rmax: int    # max Schur rows per depth frame
    iters: int
    motion_only: bool = False


class BAPlan(NamedTuple):
    """Host-built index plan (device arrays with static shapes)."""
    ii: jnp.ndarray          # [E] global source frames (padded)
    jj: jnp.ndarray          # [E] global target frames
    edge_valid: jnp.ndarray  # [E] bool
    k_valid: jnp.ndarray     # [NW] bool — window frame is a depth variable
    row_pose: jnp.ndarray    # [NW+E] solve-local pose of each Schur row (-1 none)
    row_depth: jnp.ndarray   # [NW+E] window-local depth frame of each row
    rk_idx: jnp.ndarray      # [NW, RMAX] row ids grouped by depth frame (-1 pad)
    g0: jnp.ndarray          # scalar: window start frame
    t0: jnp.ndarray          # scalar: first free pose
    t1: jnp.ndarray          # scalar: end of free poses


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {buckets[-1]}")


EDGE_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)
WINDOW_BUCKETS = (16, 32, 64, 128, 256, 512, 1024)
RMAX_BUCKETS = (8, 16, 32, 64, 128)


def build_plan(ii: np.ndarray, jj: np.ndarray, t0: int, t1: int,
               iters: int = 2, motion_only: bool = False, valid=None,
               edges: int = None, rmax: int = None, window: int = None):
    """Build (BAShape, BAPlan) from a concrete edge list on the host.

    `valid` (optional bool mask over ii/jj) marks real edges when the caller
    supplies an already-padded layout (the fused frontend update passes
    [inactive | active-bucket] so plan rows line up with its device arrays).

    O(E) python/numpy; runs whenever the edge set changes (cheap next to the
    device work, and the resulting plan is reused across GN iterations).
    """
    ii = np.asarray(ii, np.int64)
    jj = np.asarray(jj, np.int64)
    if valid is None:
        valid = np.ones(len(ii), bool)
    valid = np.asarray(valid, bool)
    vi = ii[valid]
    vj = jj[valid]
    g0 = int(min(vi.min(), vj.min(), t0)) if len(vi) else int(t0)
    nw = t1 - g0
    # callers on the hot path pass a FIXED edge bucket so the compiled
    # program's static key does not wobble frame-to-frame
    E = edges if edges is not None else _bucket(max(len(ii), 1), EDGE_BUCKETS)
    assert E >= len(ii), (E, len(ii))
    if window is not None and window >= nw:
        NW = window
    else:
        NW = _bucket(nw, WINDOW_BUCKETS)

    ii_p = np.full(E, g0, np.int32)
    jj_p = np.full(E, g0, np.int32)
    ii_p[:len(ii)] = np.where(valid, ii, g0)
    jj_p[:len(jj)] = np.where(valid, jj, g0)
    edge_valid = np.zeros(E, bool)
    edge_valid[:len(ii)] = valid

    row_pose, row_depth, k_valid, rk_idx, RMAX = _build_rows(
        vi, vj, ii_p, jj_p, edge_valid, t0, t1, g0, NW, E, rmax_hint=rmax)

    shape = BAShape(edges=E, window=NW, rmax=RMAX, iters=iters,
                    motion_only=motion_only)
    # numpy-backed plan: callers either jit it (args become device arrays)
    # or pack it into a single host->device transfer (state/graph.py)
    plan = BAPlan(
        ii=ii_p, jj=jj_p, edge_valid=edge_valid, k_valid=k_valid,
        row_pose=row_pose, row_depth=row_depth, rk_idx=rk_idx,
        g0=np.int32(g0), t0=np.int32(t0), t1=np.int32(t1))
    return shape, plan


def _build_rows(vi, vj, ii_p, jj_p, edge_valid, t0, t1, g0, NW, E,
                rmax_hint=None):
    """Schur row table + per-depth-frame grouping; native C++ fast path
    (droid_slam_tpu/native/plan_builder.cpp) with a python fallback.

    vi/vj: the *valid* edge endpoints; ii_p/jj_p/edge_valid: the padded
    E-sized layout the device arrays use (row NW+e corresponds to padded
    slot e; invalid slots never join a Schur group)."""
    from .. import native

    def pick_rmax(actual):
        if rmax_hint is not None and actual <= rmax_hint:
            return rmax_hint
        return _bucket(max(actual, 1), RMAX_BUCKETS)

    res = native.build_ba_rows_masked(ii_p, jj_p, edge_valid, t0, t1, g0,
                                      NW, E, RMAX_BUCKETS[-1])
    if res is not None:
        row_pose, row_depth, k_valid, rk_full, rmax = res
        RMAX = pick_rmax(rmax)
        return row_pose, row_depth, k_valid, rk_full[:, :RMAX], RMAX

    # ---- python fallback ------------------------------------------------
    # depth variables: kx = unique(ii ∪ [t0,t1)) (droid_kernels.cu:1345-1353)
    kx = set(range(t0, t1)) | set(int(x) for x in vi)
    k_valid = np.zeros(NW, bool)
    for k in kx:
        if g0 <= k < g0 + NW:
            k_valid[k - g0] = True

    NR = NW + E
    row_pose = np.full(NR, -1, np.int32)
    row_depth = np.zeros(NR, np.int32)
    for r in range(NW):
        f = g0 + r
        row_depth[r] = r
        if t0 <= f < t1:
            row_pose[r] = f - t0
    for e in range(E):
        row_depth[NW + e] = ii_p[e] - g0
        if edge_valid[e] and t0 <= jj_p[e] < t1:
            row_pose[NW + e] = jj_p[e] - t0

    groups = [[] for _ in range(NW)]
    for r in range(NR):
        if row_pose[r] >= 0:
            groups[row_depth[r]].append(r)
    rmax = max((len(g) for g in groups), default=1)
    RMAX = pick_rmax(rmax)
    rk_idx = np.full((NW, RMAX), -1, np.int32)
    for k, g in enumerate(groups):
        rk_idx[k, :len(g)] = g
    return row_pose, row_depth, k_valid, rk_idx, RMAX


def _scatter_pose_mat(blocks, pi, pj, NW, n_free):
    valid = (pi >= 0) & (pj >= 0) & (pi < n_free) & (pj < n_free)
    idx = jnp.where(valid, pi * NW + pj, NW * NW)
    out = jax.ops.segment_sum(
        blocks * valid[:, None, None].astype(blocks.dtype), idx,
        num_segments=NW * NW + 1)
    return out[:-1].reshape(NW, NW, 6, 6)


def _scatter_pose_mat_flat(blocks, pi, pj, NW, n_free):
    """[NW*NW, 36] flat-lane variant for global-BA windows: a
    [NW,NW,6,6]-shaped grid tile-pads each 6x6 block to (8,128) on TPU —
    16x memory, 4 GB at NW=1024 (measured OOM, round 4). Keeping the 36
    block entries in the lane dimension caps the padding at 128/36."""
    valid = (pi >= 0) & (pj >= 0) & (pi < n_free) & (pj < n_free)
    idx = jnp.where(valid, pi * NW + pj, NW * NW)
    out = jax.ops.segment_sum(
        blocks.reshape(-1, 36) * valid[:, None].astype(blocks.dtype), idx,
        num_segments=NW * NW + 1)
    return out[:-1]


def _scatter_pose_vec(vecs, pi, NW, n_free):
    valid = (pi >= 0) & (pi < n_free)
    idx = jnp.where(valid, pi, NW)
    out = jax.ops.segment_sum(vecs * valid[:, None].astype(vecs.dtype), idx,
                              num_segments=NW + 1)
    return out[:-1]


@partial(jax.jit, static_argnames=("shape",), donate_argnames=("poses", "disps"))
def ba_windowed(shape: BAShape, poses, disps, disps_sens, damping, intrinsics,
                target, weight, plan: BAPlan, lm, ep):
    """Jit wrapper around ba_iterations (kept for standalone callers)."""
    return ba_iterations(shape, poses, disps, disps_sens, damping, intrinsics,
                         target, weight, plan, lm, ep)


def ba_iterations(shape: BAShape, poses, disps, disps_sens, damping,
                  intrinsics, target, weight, plan: BAPlan, lm, ep):
    """Run `shape.iters` Gauss-Newton iterations; returns (poses, disps).

    Traceable (no jit) so callers can fuse it into larger programs — the
    frontend fuses N x (ConvGRU update + BA) into one dispatch, which matters
    both for XLA scheduling and because each dispatch costs ~10-20 ms over
    the deployment's TPU tunnel.

    poses [B,7], disps/disps_sens/damping [B,h,w] are full (padded) keyframe
    buffers; target/weight [E,2,HW]; intrinsics [4] shared across frames
    (depth_video.py:222 passes intrinsics[0]).
    """
    B, h, w = disps.shape
    NW, E, RMAX = shape.window, shape.edges, shape.rmax
    hw = h * w
    win = plan.g0 + jnp.arange(NW)          # global frames of the window
    pwin = plan.t0 + jnp.arange(NW)         # global frames of the solve block
    n_free = plan.t1 - plan.t0
    p_valid = jnp.arange(NW) < n_free

    intr_all = jnp.broadcast_to(intrinsics, (B, 4))

    # per-frame damping eta = 0.2 * damping + 1e-7 (factor_graph.py:251)
    eta = 0.2 * damping[win].reshape(NW, hw) + 1e-7
    sens_w = disps_sens[win].reshape(NW, hw)
    m_sens = (sens_w > 0).astype(jnp.float32)

    # Edge-chunked linearization for global-BA scale: the per-edge pixel
    # transients (Jj [E,2,6,HW] ~1 GB at E=16k/NW=1024 plus r/w/Jz/Ei/Ej)
    # OOM a 16 GB v5e if materialized for all edges at once (measured
    # 19.9 GB peak, round 4). linearize/pose_blocks/depth_blocks are purely
    # per-edge, so a lax.scan over fixed-size chunks is BIT-IDENTICAL and
    # caps the transient at chunk/E of the full size. Frontend-scale systems
    # (E <= chunk) keep the single-pass form — identical program to before.
    echunk = _ba_edge_chunk()
    chunked = (not shape.motion_only) and E > echunk

    def _edge_blocks(poses, disps):
        n_full = E // echunk
        rem = E - n_full * echunk  # static remainder chunk (round 4: a
        # divisibility guard here silently disabled chunking at E=32832 and
        # the full-edge [E,2,6,HW] transients OOM'd the t=1000 global BA)

        def lin(s, n):
            sl = lambda v: jax.lax.dynamic_slice_in_dim(v, s, n)
            t = edge_terms.linearize(
                poses, disps, intr_all, sl(target), sl(weight),
                sl(plan.ii), sl(plan.jj), edge_valid=sl(plan.edge_valid),
                min_depth=0.25, zero_stereo_pose=True)
            return (edge_terms.pose_blocks(t), edge_terms.depth_blocks(t))

        def body(c, _):
            out = lin(c * echunk, echunk)
            return c + 1, out
        _, (Hs, Ds) = jax.lax.scan(body, 0, None, length=n_full)
        flat = lambda x: x.reshape(n_full * echunk, *x.shape[2:])
        Hs = tuple(map(flat, Hs))
        Ds = tuple(map(flat, Ds))
        if rem:
            Ht, Dt = lin(n_full * echunk, rem)
            Hs = tuple(jnp.concatenate([a, b], axis=0)
                       for a, b in zip(Hs, Ht))
            Ds = tuple(jnp.concatenate([a, b], axis=0)
                       for a, b in zip(Ds, Dt))
        return Hs, Ds

    def gn_iteration(state, _):
        poses, disps = state
        if chunked:
            (Hii, Hij, Hji, Hjj, vi, vj), (Ei_e, Ej_e, Cz_e, bz_e) = \
                _edge_blocks(poses, disps)
        else:
            t = edge_terms.linearize(
                poses, disps, intr_all, target, weight, plan.ii, plan.jj,
                edge_valid=plan.edge_valid, min_depth=0.25,
                zero_stereo_pose=True)
            Hii, Hij, Hji, Hjj, vi, vj = edge_terms.pose_blocks(t)

        pi = plan.ii - plan.t0
        pj = plan.jj - plan.t0
        # one fused scatter for all four quadrant block sets (and one for
        # both rhs halves): the separate [E,6,6] scatters are launch/layout
        # overhead at these sizes (~35 us each x 4 x 2 GN x 5 iterations).
        # Global-BA windows (NW >= 256) keep the pose grid flat-lane
        # ([NW*NW,36]) and run the Schur chunk loop as a fori_loop — see
        # _scatter_pose_mat_flat; frontend windows keep the exact original
        # program (measured fastest at those sizes).
        big_nw = NW >= _BIG_NW and not shape.motion_only
        scat_mat = _scatter_pose_mat_flat if big_nw else _scatter_pose_mat
        A = scat_mat(
            jnp.concatenate([Hii, Hij, Hji, Hjj], axis=0),
            jnp.concatenate([pi, pi, pj, pj]),
            jnp.concatenate([pi, pj, pi, pj]), NW, n_free)
        v = _scatter_pose_vec(jnp.concatenate([vi, vj]),
                              jnp.concatenate([pi, pj]), NW, n_free)

        if shape.motion_only:
            M = A.transpose(0, 2, 1, 3).reshape(NW * 6, NW * 6)
            rhs = v.reshape(NW * 6)
            dx = _solve_pose_system(M, rhs, p_valid, lm, ep).reshape(NW, 6)
            new_poses = _retract_poses(poses, pwin, p_valid, dx)
            return (new_poses, disps), None

        if not chunked:
            Ei_e, Ej_e, Cz_e, bz_e = edge_terms.depth_blocks(t)

        ki = plan.ii - plan.g0  # window-local depth index (always in range)
        Cacc = jax.ops.segment_sum(Cz_e, ki, num_segments=NW)
        wacc = jax.ops.segment_sum(bz_e, ki, num_segments=NW)

        disps_w = disps[win].reshape(NW, hw)
        C = Cacc + m_sens * ALPHA + (1.0 - m_sens) * eta
        wz = wacc - m_sens * ALPHA * (disps_w - sens_w)
        Q = jnp.where(plan.k_valid[:, None] & (C > 0), 1.0 / C,
                      jnp.zeros_like(C))

        # Schur rows [NW + E, 6, HW]
        Erows = jnp.concatenate(
            [jax.ops.segment_sum(Ei_e, ki, num_segments=NW), Ej_e], axis=0)
        rp = plan.row_pose
        rp_ok = rp >= 0

        # ---- S = E Q E^T accumulated per depth frame, chunked ------------
        # Assembly into the [NW,NW] pose grid: segment-sum scatter by
        # default (see _schur_assembly for the measured A/B vs the
        # scatter-free one-hot contraction kept behind
        # DROID_SCHUR_ASSEMBLY=proj).
        use_proj = _schur_assembly() == "proj" and not big_nw
        qw = Q * wz
        prec = edge_terms.ba_precision()

        def schur_chunk(idx, Qc):
            """One row-group chunk's [CK*RMAX*RMAX] block contributions as
            (G [*,6,6-or-36], bins [*])."""
            mask = idx >= 0
            F = Erows[jnp.clip(idx, 0)] * mask[..., None, None]
            Fq = F * Qc[:, None, None, :]
            CK = F.shape[0]
            G = jnp.einsum("kah,kbh->kab",
                           Fq.reshape(CK, RMAX * 6, hw),
                           F.reshape(CK, RMAX * 6, hw),
                           precision=prec)
            p = jnp.where(mask, rp[jnp.clip(idx, 0)], -1)    # [CK,RMAX]
            G = G.reshape(CK, RMAX, 6, RMAX, 6).transpose(0, 1, 3, 2, 4)
            p1 = p[:, :, None]
            p2 = p[:, None, :]
            bins = jnp.where((p1 >= 0) & (p2 >= 0), p1 * NW + p2, NW * NW)
            return G, bins.reshape(-1)

        if big_nw:
            # fori_loop (the frontend's unrolled form would be a 128-body
            # HLO at NW=1024) accumulating into the flat-lane grid.
            # The loop covers exactly NW rows — a remainder chunk would be
            # silently dropped, so refuse windows that don't divide (all
            # WINDOW_BUCKETS are powers of two, but build_plan(window=...)
            # is public).
            assert NW % _SCHUR_CHUNK == 0, (
                f"big-window Schur path needs window % {_SCHUR_CHUNK} == 0, "
                f"got {NW}")
            def sbody(c, S):
                c0 = c * _SCHUR_CHUNK
                idx = jax.lax.dynamic_slice_in_dim(plan.rk_idx, c0,
                                                   _SCHUR_CHUNK)
                Qc = jax.lax.dynamic_slice_in_dim(Q, c0, _SCHUR_CHUNK)
                G, bins = schur_chunk(idx, Qc)
                return S + jax.ops.segment_sum(
                    G.reshape(-1, 36), bins, num_segments=NW * NW + 1)
            S = jax.lax.fori_loop(
                0, NW // _SCHUR_CHUNK, sbody,
                jnp.zeros((NW * NW + 1, 36), jnp.float32))[:-1]
        else:
            S = (jnp.zeros((NW, NW, 6, 6), jnp.float32) if use_proj
                 else jnp.zeros((NW * NW + 1, 6, 6), jnp.float32))
            for c0 in range(0, NW, _SCHUR_CHUNK):
                G, bins = schur_chunk(plan.rk_idx[c0:c0 + _SCHUR_CHUNK],
                                      Q[c0:c0 + _SCHUR_CHUNK])
                CK = G.shape[0]
                if use_proj:
                    # one flat MXU contraction instead of a 6x6-block
                    # scatter: out[s,u] = sum_e onehot[e,s] * G[e,u]
                    oh = (bins[:, None]
                          == jnp.arange(NW * NW)[None, :]).astype(
                              jnp.float32)
                    S = S + jax.lax.dot_general(
                        oh, G.reshape(CK * RMAX * RMAX, 36),
                        dimension_numbers=(((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(NW, NW, 6, 6)
                    continue
                S = S + jax.ops.segment_sum(
                    G.reshape(CK * RMAX * RMAX, 6, 6),
                    bins, num_segments=NW * NW + 1)
            if not use_proj:
                S = S[:-1].reshape(NW, NW, 6, 6)

        # ---- S_rhs = E Q w per pose --------------------------------------
        dwr = jnp.einsum("rdh,rh->rd", Erows, qw[plan.row_depth],
                         precision=prec)
        S_rhs = _scatter_pose_vec(dwr * rp_ok[:, None], rp, NW, n_free)

        AS = ((A - S).reshape(NW, NW, 6, 6) if big_nw else (A - S))
        M = AS.transpose(0, 2, 1, 3).reshape(NW * 6, NW * 6)
        rhs = (v - S_rhs).reshape(NW * 6)
        dx = _solve_pose_system(M, rhs, p_valid, lm, ep).reshape(NW, 6)

        # ---- back-substitute depth updates (EvT + accum, cu:1417-1426) ---
        # EvT6x1 skips rows whose solve-local pose index is exactly 0
        # (`idx <= 0`, droid_kernels.cu:1116-1117): pose t0's contribution
        # never reaches dz. Reproduced by default so inference trajectories
        # match the reference bit-for-bit (tests/test_golden_pipeline.py);
        # DROID_REF_EVT_QUIRK=0 restores the complete back-substitution.
        rp_bs = (rp_ok & (rp != 0)) if _evt_quirk() else rp_ok
        dx_row = dx[jnp.clip(rp, 0)] * rp_bs[:, None]
        dw_rows = jnp.einsum("rdh,rd->rh", Erows, dx_row, precision=prec)
        acc = jax.ops.segment_sum(dw_rows, plan.row_depth, num_segments=NW)
        dz = Q * (wz - acc)

        new_poses = _retract_poses(poses, pwin, p_valid, dx)
        new_disps_w = disps_w + dz
        new_disps = disps.at[win].set(
            jnp.where(plan.k_valid[:, None], new_disps_w, disps_w)
            .reshape(NW, h, w))
        # non-finite step guard: if the fp32 assembly/solve overflowed
        # (degenerate geometry at float extremes), keep the previous iterate
        # instead of poisoning the state — generalizes solve_psd's
        # zero-step-on-Cholesky-failure to inf/NaN born in the Hessian
        # assembly itself. Bit-exact no-op whenever the step is finite.
        ok = jnp.isfinite(dx).all() & jnp.isfinite(dz).all()
        new_poses = jnp.where(ok, new_poses, poses)
        new_disps = jnp.where(ok, new_disps, disps)
        return (new_poses, new_disps), None

    (poses, disps), _ = jax.lax.scan(gn_iteration, (poses, disps), None,
                                     length=shape.iters)
    if not shape.motion_only:
        # final clamp (depth_video.py:226) + overflow ceiling (_DISP_MAX)
        win_clamped = jnp.clip(disps[win], min=0.001, max=_DISP_MAX)
        disps = disps.at[win].set(win_clamped)
    return poses, disps


def _solve_pose_system(M, rhs, p_valid, lm, ep):
    """Damp diag AFTER Schur subtraction (droid_kernels.cu:1201-1222), mask
    padding rows/cols to identity, solve with fp32 Cholesky + refinement."""
    NW6 = M.shape[0]
    mask = jnp.repeat(p_valid, 6)
    d = jnp.diag(M)
    M = M + jnp.diag(ep + lm * d)
    mm = mask[:, None] & mask[None, :]
    M = jnp.where(mm, M, jnp.zeros_like(M))
    M = M + jnp.diag(jnp.where(mask, jnp.zeros(NW6, M.dtype),
                               jnp.ones(NW6, M.dtype)))
    rhs = jnp.where(mask, rhs, jnp.zeros_like(rhs))
    return solve_psd(M, rhs, refine_steps=1)


def _retract_poses(poses, pwin, p_valid, dx):
    cur = poses[pwin]
    upd = se3.retr(cur, dx)
    return poses.at[pwin].set(jnp.where(p_valid[:, None], upd, cur))
