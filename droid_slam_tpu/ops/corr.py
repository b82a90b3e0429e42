"""Correlation volumes and pyramid lookup (XLA path).

Rebuild of the reference's two correlation kernels:
  * CorrBlock: precomputed all-pairs volume + 4-level avg-pool pyramid with a
    (2r+1)^2 bilinear window gather
    (/root/reference/droid_slam/modules/corr.py:23-71,
     /root/reference/src/correlation_kernels.cu:21-71).
  * AltCorr: on-the-fly per-edge patch dot products from feature-map pyramids,
    avoiding the O(N*HW^2) volume for global BA
    (modules/corr.py:89-117, src/altcorr_kernel.cu:24-171).

Both reduce to the same math: bilinear sampling (zero padding) of the
correlation field on a (2r+1)^2 window around the warped coordinates, with
1/16 normalization (1/4 per feature map). Output channels are ordered
level-major, then x-offset-major, y-offset-minor — the concatenation order the
update operator was trained with (modules/corr.py:46-50, altcorr permute at
src/altcorr_kernel.cu:171).

The volume build is a single big MXU matmul; the window gather is one XLA
gather per level (Pallas variant in ops/corr_pallas.py for the hot path).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NUM_LEVELS = 4
RADIUS = 3


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pooling on the last two dims [..., H, W] with
    torch's floor semantics (odd trailing row/col dropped).

    Strided slices instead of the reshape-to-(h,2,w,2) trick: the merged-dim
    reshape on a [E,HW,h,w] corr volume forces a relayout copy on TPU
    (profiled ~1.7 ms/frame in the frontend's volume build); stride-2 lane/
    sublane slices fuse into the add chain."""
    h, w = x.shape[-2] // 2, x.shape[-1] // 2
    x = x[..., :2 * h, :2 * w]
    s = ((x[..., 0::2, 0::2] + x[..., 0::2, 1::2])
         + (x[..., 1::2, 0::2] + x[..., 1::2, 1::2]))
    return s * jnp.asarray(0.25, x.dtype)


def build_volume(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation [E,h1*w1,h2,w2] = (f1/4)·(f2/4) over channels
    (modules/corr.py:63-71). fmaps are [E,h,w,C] (NHWC, bf16 ok)."""
    E, h1, w1, C = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    corr = jnp.einsum("eac,ebc->eab",
                      fmap1.reshape(E, h1 * w1, C).astype(jnp.float32) / 4.0,
                      fmap2.reshape(E, h2 * w2, C).astype(jnp.float32) / 4.0,
                      preferred_element_type=jnp.float32)
    # bf16 inputs -> bf16 volume (the reference's fp16 autocast storage,
    # modules/corr.py:63-71): halves the HBM traffic of the pyramid pooling
    # and of every later lookup pass
    out_dtype = fmap1.dtype if fmap1.dtype == jnp.bfloat16 else jnp.float32
    return corr.reshape(E, h1 * w1, h2, w2).astype(out_dtype)


def build_pyramid(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                  num_levels: int = NUM_LEVELS):
    """Volume pyramid list [[E,HW,h2/2^l,w2/2^l], ...]."""
    vol = build_volume(fmap1, fmap2)
    pyramid = [vol]
    for _ in range(num_levels - 1):
        vol = avg_pool2(vol)
        pyramid.append(vol)
    return pyramid


def _lookup_level(vol: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """Bilinear (2r+1)^2 window gather from one pyramid level.

    vol [E,HW,h2,w2]; coords [E,HW,2] at this level's scale.
    Returns [E,HW,(2r+1)^2] ordered x-offset-major.
    """
    E, HW, h2, w2 = vol.shape
    r = radius
    rd = 2 * r + 1
    volf = vol.reshape(E, HW, h2 * w2)

    x0 = jnp.floor(coords[..., 0])
    y0 = jnp.floor(coords[..., 1])
    dx = (coords[..., 0] - x0)[..., None]  # [E,HW,1]
    dy = (coords[..., 1] - y0)[..., None]

    # integer tap grid (rd+1)^2: taps (i,j) at (x0 - r + i, y0 - r + j)
    ti = jnp.arange(rd + 1, dtype=vol.dtype)
    xi = x0[..., None, None] - r + ti[None, None, :, None]  # [E,HW,rd+1,1]
    yj = y0[..., None, None] - r + ti[None, None, None, :]  # [E,HW,1,rd+1]
    xi = jnp.broadcast_to(xi, x0.shape + (rd + 1, rd + 1))
    yj = jnp.broadcast_to(yj, y0.shape + (rd + 1, rd + 1))
    inb = (xi >= 0) & (xi < w2) & (yj >= 0) & (yj < h2)
    idx = (jnp.clip(yj, 0, h2 - 1) * w2 + jnp.clip(xi, 0, w2 - 1)).astype(jnp.int32)

    taps = jnp.take_along_axis(volf, idx.reshape(E, HW, -1), axis=-1)
    taps = (taps * inb.reshape(E, HW, -1).astype(taps.dtype)) \
        .reshape(E, HW, rd + 1, rd + 1)

    # fold the 4-corner bilinear weights into the window (cu:48-67):
    # out[a,b] = (1-dx)(1-dy) taps[a,b] + dx(1-dy) taps[a+1,b]
    #          + (1-dx)dy taps[a,b+1] + dx dy taps[a+1,b+1]
    out = ((1 - dx) * (1 - dy))[..., None] * taps[:, :, :rd, :rd] \
        + (dx * (1 - dy))[..., None] * taps[:, :, 1:, :rd] \
        + ((1 - dx) * dy)[..., None] * taps[:, :, :rd, 1:] \
        + (dx * dy)[..., None] * taps[:, :, 1:, 1:]
    return out.reshape(E, HW, rd * rd)


def _lookup_level_tent(vol: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """Window lookup as two separable tent-weight MXU contractions.

    The bilinear window sample is separable:
      out[p,a,b] = sum_h sum_w T(y(p)+b-r-h) T(x(p)+a-r-w) vol[p,h,w]
    with T the unit tent function — the tent weights fold the bilinear blend
    into the matmuls and (unlike a one-hot formulation, which XLA
    pattern-matches back into a slow gather) keep the computation on the MXU.
    Out-of-range rows/columns receive zero weight, reproducing the CUDA
    kernel's zero padding.

    vol [E,HW,h2,w2]; coords [E,HW,2]. Returns [E,HW,(2r+1)^2] f32,
    x-offset-major.
    """
    E, HW, h2, w2 = vol.shape
    r = radius
    rd = 2 * r + 1

    cdt = vol.dtype if vol.dtype == jnp.bfloat16 else jnp.float32
    x = coords[..., 0]
    y = coords[..., 1]
    off = jnp.arange(rd, dtype=jnp.float32)

    # tent weights T(pos - grid): [E,HW,rd,h2] and [E,HW,rd,w2]
    ypos = y[..., None, None] + (off - r)[None, None, :, None]
    wy = jnp.clip(1.0 - jnp.abs(
        ypos - jnp.arange(h2, dtype=jnp.float32)), 0.0, 1.0).astype(cdt)
    xpos = x[..., None, None] + (off - r)[None, None, :, None]
    wx = jnp.clip(1.0 - jnp.abs(
        xpos - jnp.arange(w2, dtype=jnp.float32)), 0.0, 1.0).astype(cdt)

    rows = jnp.einsum("ekbh,ekhw->ekbw", wy, vol)      # [E,HW,rd,w2]
    taps = jnp.einsum("ekbw,ekaw->ekba", rows, wx)     # [E,HW,rd(b),rd(a)]
    return taps.astype(jnp.float32).transpose(0, 1, 3, 2).reshape(
        E, HW, rd * rd)


def _lookup_level_dense(vol: jnp.ndarray, coords: jnp.ndarray, radius: int,
                        out_dtype=jnp.float32):
    """Tent-weight lookup as fused broadcast-multiply-reduce (VPU) instead of
    batched tiny matmuls (which the MXU executes one 8x40 matrix at a time).

    Same math as _lookup_level_tent; lowers to dense vectorized
    multiply-accumulate loops that XLA fuses without materializing the
    5-D product. Output channels come out x-offset-major DIRECTLY (the
    y-step's broadcast axes are arranged [h, a, b]) — no post-hoc
    [E,HW,b,a] transpose copy. ``out_dtype=bfloat16`` fuses the GRU-input
    cast into the reduction (accumulation stays f32), skipping the f32
    materialization of the 196-channel feature tensor.
    """
    E, HW, h2, w2 = vol.shape
    r = radius
    rd = 2 * r + 1

    x = coords[..., 0]
    y = coords[..., 1]
    off = jnp.arange(rd, dtype=jnp.float32)

    # compute in the volume's dtype (bf16 volumes multiply in bf16 — an f32
    # upcast would materialize a full extra copy of the ~GB-scale volume;
    # profiled at +8 ms/iteration on v5e) and ACCUMULATE in f32
    cdt = vol.dtype if vol.dtype == jnp.bfloat16 else jnp.float32
    # x-step: cols[p,h,a] = sum_w T(x+a-r-w) vol[p,h,w]
    xpos = x[..., None, None] + (off - r)[None, None, :, None]  # [E,HW,rd,1]
    wx = jnp.clip(1.0 - jnp.abs(
        xpos - jnp.arange(w2, dtype=jnp.float32)), 0.0, 1.0).astype(cdt)
    # f32 accumulate, then store the intermediate back in the compute dtype:
    # the [E,HW,h2,rd] cols tensor is ~quarter-GB at L0 and the final corr
    # features are cast to bf16 for the GRU anyway
    cols = jnp.sum(wx[:, :, None, :, :] * vol[:, :, :, None, :],
                   axis=-1, dtype=jnp.float32).astype(cdt)      # [E,HW,h2,rd]
    # y-step: out[p,a,b] = sum_h T(y+b-r-h) cols[p,h,a], with the tent
    # weights built directly in [E,HW,h2,rd] order so the output needs no
    # transpose. Weights multiply in the compute dtype too — an f32 wy
    # forces XLA to materialize an f32 upconversion of the quarter-GB cols
    # intermediate (profiled at ~1.7 ms/frame); accumulation stays f32.
    ypos = y[..., None, None] + (off - r)[None, None, None, :]  # [E,HW,1,rd]
    wy = jnp.clip(1.0 - jnp.abs(
        ypos - jnp.arange(h2, dtype=jnp.float32)[:, None]), 0.0,
        1.0).astype(cdt)                                        # [E,HW,h2,rd]
    out = jnp.sum(cols[:, :, :, :, None] * wy[:, :, :, None, :],
                  axis=2, dtype=jnp.float32)                    # [E,HW,a,b]
    return out.astype(out_dtype).reshape(E, HW, rd * rd)


def _lookup_level_rows(vol: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """Window lookup as a row gather + fused VPU tent contraction.

    Three steps, all TPU-friendly:
      1. gather the (2r+2) integer y-rows around each pixel's coords — a
         take_along_axis over the second-minor axis, i.e. contiguous
         w2-length slices (row copies, not scalar gathers);
      2. tent-weight contraction in x, fused by XLA into a vectorized
         multiply-accumulate (no materialized 5-D product);
      3. 2-tap bilinear blend in y (the altcorr D-trick,
         src/altcorr_kernel.cu:160-171).

    ~5x less FLOPs and ~5x less intermediate traffic than the full tent
    formulation because the h2 axis is reduced by the gather instead of by
    arithmetic. vol [E,HW,h2,w2]; coords [E,HW,2]. Returns
    [E,HW,(2r+1)^2] f32, x-offset-major.
    """
    E, HW, h2, w2 = vol.shape
    r = radius
    rd = 2 * r + 1
    D = 2 * r + 2

    x = coords[..., 0]
    y = coords[..., 1]
    y0 = jnp.floor(y).astype(jnp.int32)
    b = jnp.arange(D, dtype=jnp.int32)
    yi = y0[..., None] - r + b                       # [E,HW,D]
    yin = (yi >= 0) & (yi < h2)
    rows = jnp.take_along_axis(vol, jnp.clip(yi, 0, h2 - 1)[..., None],
                               axis=2)               # [E,HW,D,w2]
    rows = rows.astype(jnp.float32) * yin[..., None]

    off = jnp.arange(rd, dtype=jnp.float32)
    xpos = x[..., None, None] + (off - r)[None, None, :, None]
    wx = jnp.clip(1.0 - jnp.abs(
        xpos - jnp.arange(w2, dtype=jnp.float32)), 0.0, 1.0)  # [E,HW,rd,w2]
    cols = jnp.sum(rows[:, :, :, None, :] * wx[:, :, None, :, :],
                   axis=-1)                          # [E,HW,D,rd(x)]

    dy = (y - jnp.floor(y))[..., None, None]
    out = (1.0 - dy) * cols[:, :, :rd, :] + dy * cols[:, :, 1:, :]
    # [E,HW,rd(y),rd(x)] -> x-major channels
    return out.transpose(0, 1, 3, 2).reshape(E, HW, rd * rd)


def _lookup_level_onehot(vol: jnp.ndarray, coords: jnp.ndarray, radius: int):
    """Window lookup expressed as two one-hot MXU contractions — the
    TPU-native formulation (XLA scalar gathers are ~100x slower here).

    Decomposition (mirrors the Pallas kernel in ops/corr_pallas.py, which the
    current deployment cannot compile through the remote-AOT path):
      1. y-selection: one-hot over volume rows; out-of-range rows match
         nothing, reproducing the CUDA kernel's zero padding.
      2. x-selection: one-hot over columns on the (2r+2) integer grid.
      3. bilinear blend of the D x D integer grid into (2r+1)^2 taps
         (the altcorr D-trick, src/altcorr_kernel.cu:160-171).

    vol [E,HW,h2,w2]; coords [E,HW,2]. Returns [E,HW,(2r+1)^2] f32,
    x-offset-major.
    """
    E, HW, h2, w2 = vol.shape
    r = radius
    rd = 2 * r + 1
    D = 2 * r + 2

    x0 = jnp.floor(coords[..., 0])
    y0 = jnp.floor(coords[..., 1])
    dx = (coords[..., 0] - x0)[..., None, None]
    dy = (coords[..., 1] - y0)[..., None, None]
    xi0 = x0.astype(jnp.int32)
    yi0 = y0.astype(jnp.int32)

    cdt = vol.dtype if vol.dtype == jnp.bfloat16 else jnp.float32
    off = jnp.arange(D, dtype=jnp.int32)
    oh_y = (jnp.arange(h2, dtype=jnp.int32)[None, None, None, :]
            == (yi0[..., None] - r + off)[..., None]).astype(cdt)
    rows = jnp.einsum("ekbh,ekhw->ekbw", oh_y, vol)  # [E,HW,D,w2]
    oh_x = (jnp.arange(w2, dtype=jnp.int32)[None, None, None, :]
            == (xi0[..., None] - r + off)[..., None]).astype(cdt)
    taps = jnp.einsum("ekbw,ekaw->ekba", rows, oh_x).astype(jnp.float32)

    # taps dims are [..., b(y), a(x)]: dx advances a, dy advances b
    out = ((1.0 - dx) * (1.0 - dy) * taps[..., :rd, :rd]
           + dx * (1.0 - dy) * taps[..., :rd, 1:]
           + (1.0 - dx) * dy * taps[..., 1:, :rd]
           + dx * dy * taps[..., 1:, 1:])
    # [E,HW,b(y),a(x)] -> x-major channels
    return out.transpose(0, 1, 3, 2).reshape(E, HW, rd * rd)


# ---------------------------------------------------------------------------
# Channel-major ("cm") volume layout: pixels in lanes
# ---------------------------------------------------------------------------
#
# The standard [E,HW,h2,w2] layout puts w2 in the minor (lane) dimension:
# 64/32/16/8 lanes of the TPU's 128 are filled, so every full-volume pass of
# the tent lookup runs at 50%/25%/12%/6% of the VPU's lane width and of HBM
# tile efficiency (profiled: the L0 x-pass reads 630 MB at ~53% of peak BW,
# L1 at ~27%). The cm layout [E,h2,w2,HW] keeps HW = 2560 in lanes — full
# 128-lane tiles at EVERY pyramid level — and the tent contractions reduce
# over major axes (plain row accumulation, no cross-lane work). Taps come out
# channel-major [E,(2r+1)^2,HW], which the 1x1 corr-encoder conv consumes
# directly as a lane-major matmul (models/nets.py).

def build_volume_cm(fmap1: jnp.ndarray, fmap2: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation in channel-major layout [E,h2,w2,h1*w1]
    (same math as build_volume, modules/corr.py:63-71)."""
    E, h1, w1, C = fmap1.shape
    h2, w2 = fmap2.shape[1:3]
    corr = jnp.einsum("ebc,eac->eba",
                      fmap2.reshape(E, h2 * w2, C).astype(jnp.float32) / 4.0,
                      fmap1.reshape(E, h1 * w1, C).astype(jnp.float32) / 4.0,
                      preferred_element_type=jnp.float32)
    out_dtype = fmap1.dtype if fmap1.dtype == jnp.bfloat16 else jnp.float32
    return corr.reshape(E, h2, w2, h1 * w1).astype(out_dtype)


def avg_pool2_cm(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pooling on dims [..., h, w, P] (h/w NOT minor;
    the strided slices touch only major axes, so no relayout copies)."""
    h, w = x.shape[-3] // 2, x.shape[-2] // 2
    x = x[..., :2 * h, :2 * w, :]
    s = ((x[..., 0::2, 0::2, :] + x[..., 0::2, 1::2, :])
         + (x[..., 1::2, 0::2, :] + x[..., 1::2, 1::2, :]))
    return s * jnp.asarray(0.25, x.dtype)


def _avg_pool_fmap(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 average pooling on dims [E, h, w, C] (C stays minor)."""
    h, w = x.shape[1] // 2, x.shape[2] // 2
    x = x[:, :2 * h, :2 * w]
    s = ((x[:, 0::2, 0::2] + x[:, 0::2, 1::2])
         + (x[:, 1::2, 0::2] + x[:, 1::2, 1::2]))
    return s * jnp.asarray(0.25, x.dtype)


def build_pyramid_cm(fmap1: jnp.ndarray, fmap2: jnp.ndarray,
                     num_levels: int = NUM_LEVELS):
    """Channel-major volume pyramid [[E,h2/2^l,w2/2^l,HW], ...].

    Each level correlates fmap1 against the 2^l-avg-pooled fmap2 instead of
    avg-pooling the L0 volume: mean-of-dot-products == dot-with-mean, so
    this is the reference pyramid (modules/corr.py:35-38) up to f32
    summation order. The pools now run on [E,h,w,128] feature maps (~MBs)
    instead of the [E,h,w,HW] L0 volume (~340 MB at bench shapes), each
    level is an MXU einsum, and the full-volume relayout copy XLA inserted
    between the L0 einsum and the pool's strided slices disappears
    (profiled 0.64 ms/frame of pure copy, round 5)."""
    E, h1, w1, C = fmap1.shape
    f1 = fmap1.reshape(E, h1 * w1, C).astype(jnp.float32) / 4.0
    out_dtype = fmap1.dtype if fmap1.dtype == jnp.bfloat16 else jnp.float32
    f2 = fmap2.astype(jnp.float32) / 4.0
    pyramid = []
    for lvl in range(num_levels):
        h2, w2 = f2.shape[1:3]
        corr = jnp.einsum("ebc,eac->eba", f2.reshape(E, h2 * w2, C), f1,
                          preferred_element_type=jnp.float32)
        pyramid.append(corr.reshape(E, h2, w2, h1 * w1).astype(out_dtype))
        if lvl + 1 < num_levels:
            f2 = _avg_pool_fmap(f2)
    return pyramid


def _lookup_level_dense_cm(vol: jnp.ndarray, coords: jnp.ndarray, radius: int,
                           out_dtype=jnp.bfloat16, cols_order=None):
    """Tent-weight lookup on a channel-major volume level.

    Same math as _lookup_level_dense (two separable tent contractions,
    f32 accumulation, compute dtype = volume dtype), but with pixels in
    lanes: both passes reduce over a major axis at full 128-lane width.

    vol [E,h2,w2,P]; coords [E,P,2] at this level's scale.
    Returns [E,(2r+1)^2,P], channel index c = a*(2r+1)+b (x-offset-major,
    matching _lookup_level_dense's output order).

    ``cols_order`` picks the x-pass intermediate's axis order, "ah"
    ([E,rd,h2,P]) or "ha" ([E,h2,rd,P]) — same math, very different XLA
    codegen. Measured per level on v5e at the live bench shapes
    (ms/lookup, /tmp profile round 7): L0 ah 1.53 / ha 1.86; L1 ah 1.31 /
    ha 0.48; L2 ah 0.09 / ha 0.29; L3 ah 0.37 / ha 0.016 — neither order
    wins everywhere, so lookup_pyramid_cm selects per level
    (CM_COLS_ORDERS); DROID_CM_COLS=ah|ha forces one globally for A/B.
    """
    E, h2, w2, P = vol.shape
    r = radius
    rd = 2 * r + 1

    x = coords[..., 0]  # [E,P]
    y = coords[..., 1]
    off = jnp.arange(rd, dtype=jnp.float32)
    cdt = vol.dtype if vol.dtype == jnp.bfloat16 else jnp.float32

    import os
    env = os.environ.get("DROID_CM_COLS", "")
    order = env if env in ("ah", "ha") else (cols_order or "ah")
    ah = order != "ha"
    xpos = x[:, None, None, :] + (off - r)[None, :, None, None]  # [E,rd,1,P]
    wx = jnp.clip(1.0 - jnp.abs(
        xpos - jnp.arange(w2, dtype=jnp.float32)[None, None, :, None]),
        0.0, 1.0).astype(cdt)                                    # [E,rd,w2,P]
    if ah:
        ypos = y[:, None, None, :] + (off - r)[None, :, None, None]
        wy = jnp.clip(1.0 - jnp.abs(
            ypos - jnp.arange(h2, dtype=jnp.float32)[None, None, :, None]),
            0.0, 1.0).astype(cdt)                                # [E,rd,h2,P]
        cols = jnp.sum(vol[:, None, :, :, :] * wx[:, :, None, :, :],
                       axis=3, dtype=jnp.float32).astype(cdt)    # [E,rd,h2,P]
        # y-step: out[e,a,b,p] = sum_h T(y(p)+b-r-h) cols[e,a,h,p]
        out = jnp.sum(cols[:, :, None, :, :] * wy[:, None, :, :, :],
                      axis=3, dtype=jnp.float32)                 # [E,a,b,P]
    else:
        ypos = y[:, None, None, :] + (off - r)[None, None, :, None]
        wy = jnp.clip(1.0 - jnp.abs(
            ypos - jnp.arange(h2, dtype=jnp.float32)[None, :, None, None]),
            0.0, 1.0).astype(cdt)                                # [E,h2,rd,P]
        cols = jnp.sum(vol[:, :, None, :, :] * wx[:, None, :, :, :],
                       axis=3, dtype=jnp.float32).astype(cdt)    # [E,h2,rd,P]
        # y-step: out[e,a,b,p] = sum_h T(y(p)+b-r-h) cols[e,h,a,p]
        out = jnp.sum(cols[:, :, :, None, :] * wy[:, :, None, :, :],
                      axis=1, dtype=jnp.float32)                 # [E,a,b,P]
    return out.astype(out_dtype).reshape(E, rd * rd, P)


# per-level x-pass intermediate ordering, measured on v5e (see
# _lookup_level_dense_cm docstring); levels beyond the table reuse "ha"
# (the small-h2 winner)
CM_COLS_ORDERS = ("ah", "ha", "ah", "ha")


def lookup_pyramid_cm(pyramid_cm, cflat: jnp.ndarray, radius: int = RADIUS,
                      out_dtype=jnp.bfloat16):
    """Sample all channel-major levels at level-0 coords [E,P,2].

    Returns [E, L*(2r+1)^2, P] with the reference's level-major,
    x-offset-major channel order (modules/corr.py:46-50)."""
    outs = [_lookup_level_dense_cm(
                vol, cflat / (2.0 ** lvl), radius, out_dtype=out_dtype,
                cols_order=(CM_COLS_ORDERS[lvl]
                            if lvl < len(CM_COLS_ORDERS) else "ha"))
            for lvl, vol in enumerate(pyramid_cm)]
    return jnp.concatenate(outs, axis=1)


def _lookup_level_impl(vol, coords, radius, impl="auto",
                       out_dtype=jnp.float32):
    if impl == "auto":
        impl = "tent" if jax.default_backend() != "cpu" else "gather"
    if impl == "tent":
        return _lookup_level_tent(vol, coords, radius)
    if impl == "dense":
        return _lookup_level_dense(vol, coords, radius, out_dtype=out_dtype)
    if impl == "rows":
        return _lookup_level_rows(vol, coords, radius)
    if impl == "onehot":
        return _lookup_level_onehot(vol, coords, radius)
    return _lookup_level(vol, coords, radius)


@partial(jax.jit, static_argnames=("radius", "impl"))
def lookup_pyramid(pyramid, coords: jnp.ndarray, radius: int = RADIUS,
                   impl: str = "auto"):
    """Sample all levels at level-0 coords [E,h,w,2] -> [E,h,w,L*(2r+1)^2]."""
    E, h, w, _ = coords.shape
    cflat = coords.reshape(E, h * w, 2)
    outs = []
    for lvl, vol in enumerate(pyramid):
        outs.append(_lookup_level_impl(vol, cflat / (2.0 ** lvl), radius,
                                       impl))
    out = jnp.concatenate(outs, axis=-1)
    return out.reshape(E, h, w, -1)


# ---------------------------------------------------------------------------
# AltCorr: on-the-fly correlation from feature pyramids (global BA path)
# ---------------------------------------------------------------------------

def build_fmap_pyramid(fmaps: jnp.ndarray, num_levels: int = NUM_LEVELS):
    """fmaps [N,h,w,C] -> list of [N,h/2^l,w/2^l,C]."""
    pyr = [fmaps]
    x = fmaps
    for _ in range(num_levels - 1):
        x = avg_pool2(x.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
        pyr.append(x)
    return pyr


def _alt_level(f1: jnp.ndarray, f2l: jnp.ndarray, coords: jnp.ndarray,
               jj: jnp.ndarray, radius: int):
    """One level of altcorr: f1 [E,HW,C] (level-0 source features of edges),
    f2l [N,hl,wl,C], coords [E,HW,2] at this level's scale.

    Computes integer-offset dot products on the (2r+2)^2 grid then blends
    bilinearly to (2r+1)^2 (altcorr_kernel.cu:24-75,160-171).

    TPU-native formulation: the feature table is flattened to
    [N*hl*wl, C=128] so each sampled element is a full 128-lane contiguous
    row — gathers become efficient row copies rather than scattered scalars.
    """
    E, HW, C = f1.shape
    N, hl, wl, _ = f2l.shape
    r = radius
    D = 2 * r + 2
    f2flat = f2l.reshape(N * hl * wl, C)
    base = (jj * (hl * wl))[:, None]  # [E,1] flat-row offset of frame jj

    x0 = jnp.floor(coords[..., 0])
    y0 = jnp.floor(coords[..., 1])
    dx = coords[..., 0] - x0
    dy = coords[..., 1] - y0

    corr_int = []
    for di in range(D):          # y offset index (cu:60)
        row = []
        for dj in range(D):      # x offset index
            xi = x0 + (dj - r)
            yi = y0 + (di - r)
            inb = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
            idx = base + (jnp.clip(yi, 0, hl - 1) * wl
                          + jnp.clip(xi, 0, wl - 1)).astype(jnp.int32)
            f2g = f2flat[idx]  # [E,HW,C] row gather
            dot = jnp.einsum("ehc,ehc->eh", f1, f2g,
                             preferred_element_type=jnp.float32) / 16.0
            row.append(dot * inb.astype(dot.dtype))
        corr_int.append(jnp.stack(row, axis=-1))
    corr_int = jnp.stack(corr_int, axis=-2)  # [E,HW,D(y),D(x)]

    w00 = ((1 - dx) * (1 - dy))[..., None, None]
    w10 = (dx * (1 - dy))[..., None, None]
    w01 = ((1 - dx) * dy)[..., None, None]
    w11 = (dx * dy)[..., None, None]
    rd = 2 * r + 1
    out = (w00 * corr_int[..., :rd, :rd] + w10 * corr_int[..., :rd, 1:]
           + w01 * corr_int[..., 1:, :rd] + w11 * corr_int[..., 1:, 1:])
    # [E,HW,rd(y),rd(x)] -> x-major ordering (altcorr permute, cu:171)
    return out.transpose(0, 1, 3, 2).reshape(E, HW, rd * rd)


@partial(jax.jit, static_argnames=("radius",))
def alt_lookup(fmap_pyramid, coords: jnp.ndarray, ii: jnp.ndarray,
               jj: jnp.ndarray, radius: int = RADIUS):
    """AltCorrBlock.__call__ (modules/corr.py:104-117): correlation features
    for edges (ii -> jj) computed from the feature pyramid directly.

    fmap_pyramid: list of [N,h/2^l,w/2^l,C]; coords [E,h,w,2] level-0.
    Returns [E,h,w,L*(2r+1)^2].
    """
    E, h, w, _ = coords.shape
    C = fmap_pyramid[0].shape[-1]
    f1 = fmap_pyramid[0][ii].reshape(E, h * w, C).astype(jnp.float32)
    cflat = coords.reshape(E, h * w, 2)
    outs = []
    for lvl, f2l in enumerate(fmap_pyramid):
        outs.append(_alt_level(f1, f2l.astype(jnp.float32),
                               cflat / (2.0 ** lvl), jj, radius))
    return jnp.concatenate(outs, axis=-1).reshape(E, h, w, -1)
