"""Pallas TPU kernel for the correlation-pyramid window lookup.

The lookup samples a (2r+1)^2 bilinear window around per-pixel warped
coordinates from each edge's correlation volume
(corr_index_forward_kernel, /root/reference/src/correlation_kernels.cu:21-71).
An XLA gather formulation touches 49*4 scattered scalars per pixel; this
kernel instead DMAs each pixel-block's volume rows into VMEM contiguously
(full-bandwidth bulk copies) and performs the window selection as four
vectorized lane-gathers with the bilinear weights folded in.

Slot indirection (the FactorGraph stores volumes in slot-stable buffers) is
handled with a scalar-prefetched slot table feeding the BlockSpec index map,
so no [E, HW, L] materialization ever happens.
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
    """One (edge, pixel-block): vol_ref [1, PB, L], xs/ys [1, PB],
    out [1, PB, (2r+1)^2]."""
    r = radius
    rd = 2 * r + 1
    x = xs_ref[0, :]
    y = ys_ref[0, :]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    dx = (x - x0)[:, None]
    dy = (y - y0)[:, None]

    PB = x.shape[0]
    # window offsets, x-major channel order (a = x offset, b = y offset)
    a = jax.lax.broadcasted_iota(jnp.float32, (PB, rd * rd), 1) // rd
    b = jax.lax.broadcasted_iota(jnp.float32, (PB, rd * rd), 1) % rd

    vol = vol_ref[0].astype(jnp.float32)

    def corner(ox, oy):
        xi = x0[:, None] - r + a + ox
        yi = y0[:, None] - r + b + oy
        inb = (xi >= 0) & (xi < w2) & (yi >= 0) & (yi < h2)
        idx = (jnp.clip(yi, 0, h2 - 1) * w2
               + jnp.clip(xi, 0, w2 - 1)).astype(jnp.int32)
        taps = jnp.take_along_axis(vol, idx, axis=-1)
        return jnp.where(inb, taps, 0.0)

    out = ((1.0 - dx) * (1.0 - dy) * corner(0, 0)
           + dx * (1.0 - dy) * corner(1, 0)
           + (1.0 - dx) * dy * corner(0, 1)
           + dx * dy * corner(1, 1))
    out_ref[0, :, :] = out


@functools.partial(jax.jit, static_argnames=("radius", "interpret"))
def lookup_level_slots(vol, slots, coords, radius: int = RADIUS,
                       interpret: bool = False):
    """Window lookup on one pyramid level with slot indirection.

    vol [EB, HW, h2, w2] (slot-addressed volumes); slots [EA];
    coords [EA, HW, 2] at this level's scale. Returns [EA, HW, (2r+1)^2] f32.
    """
    EB, HW, h2, w2 = vol.shape
    EA = slots.shape[0]
    rd = 2 * radius + 1
    L = h2 * w2
    volf = vol.reshape(EB, HW, L)

    PB = 256 if HW % 256 == 0 else 128 if HW % 128 == 0 else HW
    n_pb = HW // PB

    xs = coords[..., 0]
    ys = coords[..., 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(EA, n_pb),
        in_specs=[
            pl.BlockSpec((1, PB), lambda e, p, s: (e, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB), lambda e, p, s: (e, p),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PB, L), lambda e, p, s: (s[e], p, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, PB, rd * rd), lambda e, p, s: (e, p, 0),
                               memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_lookup_kernel, w2=w2, h2=h2, radius=radius)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((EA, HW, rd * rd), jnp.float32),
        interpret=interpret,
    )(slots.astype(jnp.int32), xs, ys, volf)


def lookup_pyramid_slots(pyramid, slots, coords, radius: int = RADIUS,
                         interpret: bool = False):
    """All-level lookup -> [EA, HW, L*(2r+1)^2] (level-major channels)."""
    EA, HW, _ = coords.shape
    outs = []
    for lvl, vol in enumerate(pyramid):
        outs.append(lookup_level_slots(vol, slots, coords / (2.0 ** lvl),
                                       radius, interpret=interpret))
    return jnp.concatenate(outs, axis=-1)
