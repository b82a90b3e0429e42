"""Pallas TPU kernel for the correlation-pyramid window lookup.

The lookup samples a (2r+1)^2 bilinear window around per-pixel warped
coordinates from each edge's correlation volume
(corr_index_forward_kernel, /root/reference/src/correlation_kernels.cu:21-71).
An XLA gather formulation touches 49*4 scattered scalars per pixel (~470 ms
per 48-edge update on v5e); this kernel DMAs each pixel-block's volume rows
into VMEM contiguously and decomposes the 2-D window selection into
TPU-friendly primitives:

  * y-selection: a one-hot contraction over the volume's row dimension
    (vectorized compare + batched matmul; out-of-range rows select nothing,
    which reproduces the kernel's zero-padding for free);
  * x-selection: a second one-hot contraction over the lane dimension —
    Mosaic rejects the merged-dims reshape an in-register lane gather would
    need ("infer-vector-layout: unsupported shape cast"), and the D x w2
    compare+matmul is effectively free on the MXU;
  * bilinear blend of the (2r+2)^2 integer grid into (2r+1)^2 taps
    (the altcorr D-trick, src/altcorr_kernel.cu:160-171).

Slot indirection (the FactorGraph stores volumes in slot-stable buffers) is
handled with a scalar-prefetched slot table feeding the BlockSpec index map,
so no [E, HW, ...] gather of volumes ever materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RADIUS = 3


def _lookup_kernel(slots_ref, xs_ref, ys_ref, vol_ref, out_ref, *, w2, h2,
                   radius):
    """One (edge, pixel-block): vol_ref [1, PB, h2, w2], xs/ys [1, PB, 1]
    (pixel dim on sublanes — Mosaic cannot re-layout a lane vector into the
    batch dim, "unsupported shape cast"), out [1, PB, rd, rd] ordered
    (y-offset, x-offset)."""
    r = radius
    rd = 2 * r + 1
    D = 2 * r + 2
    x = xs_ref[0]                       # [PB, 1]
    y = ys_ref[0]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[:, :, None]           # [PB, 1, 1]
    dy = (y - y0)[:, :, None]
    xi0 = x0.astype(jnp.int32)[:, :, None]
    yi0 = y0.astype(jnp.int32)[:, :, None]

    PB = x.shape[0]
    vol = vol_ref[0].astype(jnp.float32)  # [PB, h2, w2]

    # ---- y-selection: one-hot over rows; OOB rows match nothing ---------
    hh = jax.lax.broadcasted_iota(jnp.int32, (PB, D, h2), 2)
    bb = jax.lax.broadcasted_iota(jnp.int32, (PB, D, h2), 1)
    onehot = (hh == yi0 - r + bb).astype(jnp.float32)
    rows = jax.lax.dot_general(
        onehot, vol, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [PB, D(b), w2]

    # ---- x-selection: one-hot over lanes; OOB columns match nothing -----
    ww = jax.lax.broadcasted_iota(jnp.int32, (PB, D, w2), 2)
    aa = jax.lax.broadcasted_iota(jnp.int32, (PB, D, w2), 1)
    onehot_x = (ww == xi0 - r + aa).astype(jnp.float32)  # [PB, D(a), w2]
    taps = jax.lax.dot_general(
        rows, onehot_x, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # [PB, D(b), D(a)]

    # ---- bilinear blend D x D -> rd x rd (altcorr D-trick) --------------
    out = ((1.0 - dx) * (1.0 - dy) * taps[:, :rd, :rd]
           + dx * (1.0 - dy) * taps[:, :rd, 1:]
           + (1.0 - dx) * dy * taps[:, 1:, :rd]
           + dx * dy * taps[:, 1:, 1:])
    out_ref[0, :, :, :] = out  # [PB, rd(b=y), rd(a=x)]


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_level_slots(vol, slots, coords, radius: int = RADIUS,
                       interpret: bool = False):
    """Window lookup on one pyramid level with slot indirection.

    vol [EB, HW, h2, w2] (slot-addressed volumes); slots [EA];
    coords [EA, HW, 2] at this level's scale. Returns [EA, HW, (2r+1)^2] f32
    with x-offset-major channels (reference channel order).
    """
    EB, HW, h2, w2 = vol.shape
    EA = slots.shape[0]
    rd = 2 * radius + 1

    # PB=128 keeps the per-block VMEM footprint (double-buffered volume rows
    # + lane-padded window intermediates) under the 16 MiB scoped limit.
    PB = 128 if HW % 128 == 0 else HW
    n_pb = HW // PB

    xs = coords[..., 0][:, :, None]
    ys = coords[..., 1][:, :, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(EA, n_pb),
        in_specs=[
            pl.BlockSpec((1, PB, 1), lambda e, p, s: (e, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB, 1), lambda e, p, s: (e, p, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB, h2, w2), lambda e, p, s: (s[e], p, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PB, rd, rd), lambda e, p, s: (e, p, 0, 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_lookup_kernel, w2=w2, h2=h2, radius=radius)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EA, HW, rd, rd), jnp.float32),
        interpret=interpret,
    )(slots.astype(jnp.int32), xs, ys, vol)
    # (b=y, a=x) -> x-major channel order
    return out.transpose(0, 1, 3, 2).reshape(EA, HW, rd * rd)


def lookup_pyramid_slots(pyramid, slots, coords, radius: int = RADIUS,
                         interpret: bool = False):
    """All-level lookup -> [EA, HW, L*(2r+1)^2] (level-major channels)."""
    outs = []
    for lvl, vol in enumerate(pyramid):
        outs.append(lookup_level_slots(vol, slots, coords / (2.0 ** lvl),
                                       radius, interpret=interpret))
    return jnp.concatenate(outs, axis=-1)


def supported(pyramid) -> bool:
    """Kernel constraint: every level's width must fit one 128-lane tile."""
    return all(v.shape[-1] <= 128 for v in pyramid)
