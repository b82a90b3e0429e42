"""Pallas TPU kernels for the ConvGRU gate epilogues.

The GRU update (models/nets.py::conv_gru, reference gru.py:19-32) is three
MXU convs plus ~10 elementwise ops on [E,h,w,128/256] tensors. XLA's fusions
for the elementwise chain run at ~50% of HBM bandwidth (~7.5 ms/frame on
v5e, profiled via tools/xplane_leaf.py) because the chain splits into
several loop fusions that re-read the large operands.

These two kernels stream each operand exactly once at (near) full HBM
bandwidth:

  * epilogue A (between the zr conv and the q conv):
        zr = zr_conv + cf[..., :256] + pre_zr + gate_bias_zr
        z, r = sigmoid(zr[:128]), sigmoid(zr[128:])
        -> outputs z and r*net (the q conv's input)
  * epilogue B (after the q conv):
        q = tanh(q_conv + cf[..., 256:] + pre_q + gate_bias_q)
        -> output (1-z)*net + z*q

`cf` (the merged corr/flow-feature conv output, [E,h,w,384]) is passed whole
to both kernels and lane-sliced inside — BlockSpecs cannot tile a 256-lane
block out of a 384-lane array, and the over-read (~0.1 ms) is cheaper than
materializing two lane-slice copies at the XLA boundary.

Accumulation is f32 in-kernel (the XLA path's bf16 elementwise adds are
*less* accurate; parity pinned to bf16 tolerance in tests/test_gru_pallas.py).
Inference-only: pallas_call has no VJP — the training forward keeps the XLA
path (models/nets.py gates on an explicit call-site flag).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _epi_a_kernel(zrc_ref, cf_ref, prezr_ref, net_ref, gzr_ref,
                  z_ref, rnet_ref):
    zr = (zrc_ref[0].astype(jnp.float32)
          + cf_ref[0, :, :, :256].astype(jnp.float32)
          + prezr_ref[0].astype(jnp.float32)
          + gzr_ref[0, 0].astype(jnp.float32)[None, None, :])
    z = jax.nn.sigmoid(zr[..., :128])
    r = jax.nn.sigmoid(zr[..., 128:])
    z_ref[0] = z.astype(z_ref.dtype)
    rnet_ref[0] = (r * net_ref[0].astype(jnp.float32)).astype(rnet_ref.dtype)


def _epi_b_kernel(qc_ref, cf_ref, preq_ref, net_ref, z_ref, gq_ref, out_ref):
    q = jnp.tanh(qc_ref[0].astype(jnp.float32)
                 + cf_ref[0, :, :, 256:].astype(jnp.float32)
                 + preq_ref[0].astype(jnp.float32)
                 + gq_ref[0, 0].astype(jnp.float32)[None, None, :])
    net = net_ref[0].astype(jnp.float32)
    z = z_ref[0].astype(jnp.float32)
    out_ref[0] = ((1.0 - z) * net + z * q).astype(out_ref.dtype)


def _specs(h, w, chans):
    """One edge per grid step; [E,h,w,C] operands -> (1,h,w,C) blocks,
    [E,C] per-edge gate biases -> (1,C) blocks."""
    def emap4(e):
        return (e, 0, 0, 0)

    return [pl.BlockSpec((1, h, w, c), emap4) for c in chans]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_epilogue_a(zrc, cf, pre_zr, net, gzr, interpret=False):
    """zrc [E,h,w,256], cf [E,h,w,384], pre_zr [E,h,w,256], net [E,h,w,128],
    gzr [E,256] (global-context gates + conv bias, pre-summed).
    Returns (z [E,h,w,128], rnet [E,h,w,128])."""
    E, h, w, _ = net.shape
    ins = _specs(h, w, (256, 384, 256, 128))
    # per-edge gate biases as [E,1,C]: Mosaic requires the trailing two
    # block dims be (multiples of 8, 128) or the full array dims
    gspec = pl.BlockSpec((1, 1, 256), lambda e: (e, 0, 0))
    outs = _specs(h, w, (128, 128))
    return pl.pallas_call(
        _epi_a_kernel,
        grid=(E,),
        in_specs=ins + [gspec],
        out_specs=outs,
        out_shape=[jax.ShapeDtypeStruct((E, h, w, 128), net.dtype)] * 2,
        interpret=interpret,
    )(zrc, cf, pre_zr, net, gzr[:, None, :])


@functools.partial(jax.jit, static_argnames=("interpret",))
def gru_epilogue_b(qc, cf, pre_q, net, z, gq, interpret=False):
    """qc/pre_q/net/z [E,h,w,128], cf [E,h,w,384], gq [E,128].
    Returns the updated hidden state [E,h,w,128]."""
    E, h, w, _ = net.shape
    ins = _specs(h, w, (128, 384, 128, 128, 128))
    gspec = pl.BlockSpec((1, 1, 128), lambda e: (e, 0, 0))
    outs = _specs(h, w, (128,))
    return pl.pallas_call(
        _epi_b_kernel,
        grid=(E,),
        in_specs=ins + [gspec],
        out_specs=outs[0],
        out_shape=jax.ShapeDtypeStruct((E, h, w, 128), net.dtype),
        interpret=interpret,
    )(qc, cf, pre_q, net, z, gq[:, None, :])
