"""Functional NN building blocks (NHWC, bf16-friendly, flat param dicts).

Parameters live in a flat ``dict[str, jnp.ndarray]`` keyed by the reference's
torch ``state_dict`` names (e.g. ``fnet.layer1.0.conv1.weight``) so that
``droid.pth`` checkpoints map 1:1 (models/weights.py). Conv weights are stored
HWIO (converted from torch's OIHW at load time); all convs run on the MXU in
the compute dtype with fp32 accumulation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                     ("NHWC", "HWIO", "NHWC"))


def conv2d(params: dict, name: str, x: jnp.ndarray, stride: int = 1,
           padding=None) -> jnp.ndarray:
    """2D convolution, weights ``<name>.weight`` [kh,kw,in,out] and optional
    ``<name>.bias`` [out].

    Padding defaults to the torch convention (symmetric (k-1)//2, floor
    output size) — NOT XLA "SAME", whose asymmetric strided padding would
    break parity with the reference's strided convs.
    """
    w = params[name + ".weight"].astype(x.dtype)
    if padding is None:
        p_h, p_w = (w.shape[0] - 1) // 2, (w.shape[1] - 1) // 2
        padding = [(p_h, p_h), (p_w, p_w)]
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    # NOTE: no preferred_element_type here — the MXU accumulates fp32
    # internally for bf16 convs, and mixed-dtype outputs break the conv VJP.
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=padding,
        dimension_numbers=dn)
    b = params.get(name + ".bias")
    if b is not None:
        y = y + b.astype(y.dtype)
    return y.astype(x.dtype)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-sample per-channel normalization over H,W (torch InstanceNorm2d
    with affine=False, the reference's fnet config — droid_net.py:149)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


@jax.custom_vjp
def gradient_clip(x):
    """Identity forward; backward zeroes grads with |g| > 0.01 or NaN
    (modules/clipping.py:7-24)."""
    return x


def _gc_fwd(x):
    return x, None


def _gc_bwd(_, g):
    g = jnp.where(jnp.isnan(g), jnp.zeros_like(g), g)
    g = jnp.where(jnp.abs(g) > 0.01, jnp.zeros_like(g), g)
    return (g,)


gradient_clip.defvjp(_gc_fwd, _gc_bwd)


def kaiming_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """Kaiming-normal fan_out init matching extractor.py:166-168."""
    fan_out = kh * kw * cout
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std
