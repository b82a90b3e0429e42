"""DROID network family: feature/context encoders, ConvGRU update operator,
graph aggregation and convex upsampling — functional JAX, NHWC.

Architecture parity with /root/reference/droid_slam/modules/{extractor,gru}.py
and /root/reference/droid_slam/droid_net.py (C8/C9/C13/C14/C15 in SURVEY.md),
validated activation-by-activation against the torch modules in
tests/test_models.py. Parameter keys equal the torch state_dict keys.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .layers import conv2d, gradient_clip, instance_norm, kaiming_conv

DIM = 32  # extractor.py:116
CORR_PLANES = 4 * (2 * 3 + 1) ** 2  # 196, droid_net.py:81

# ImageNet normalization constants (droid_net.py:159-161)
_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


# ---------------------------------------------------------------------------
# BasicEncoder (extractor.py:118-198)
# ---------------------------------------------------------------------------

def _resblock(params, prefix, x, norm: str, stride: int):
    """ResidualBlock (extractor.py:6-55): two 3x3 convs + skip."""
    def norm_fn(h):
        return instance_norm(h) if norm == "instance" else h

    y = jax.nn.relu(norm_fn(conv2d(params, prefix + ".conv1", x, stride=stride)))
    y = jax.nn.relu(norm_fn(conv2d(params, prefix + ".conv2", y)))
    if stride != 1:
        x = norm_fn(conv2d(params, prefix + ".downsample.0", x, stride=stride))
    return jax.nn.relu(x + y)


def basic_encoder(params, prefix, x, norm: str):
    """x [N,H,W,3] -> [N,H/8,W/8,out] (extractor.py:183-198)."""
    def norm_fn(h):
        return instance_norm(h) if norm == "instance" else h

    x = jax.nn.relu(norm_fn(conv2d(params, prefix + ".conv1", x, stride=2)))
    for layer, stride in (("layer1", 1), ("layer2", 2), ("layer3", 2)):
        for blk in range(2):
            s = stride if blk == 0 else 1
            x = _resblock(params, f"{prefix}.{layer}.{blk}", x, norm, s)
    return conv2d(params, prefix + ".conv2", x)


def normalize_images(images_bgr_u8: jnp.ndarray) -> jnp.ndarray:
    """uint8 BGR [N,H,W,3] -> normalized RGB float (droid_net.py:158-161)."""
    x = images_bgr_u8[..., ::-1].astype(jnp.float32) / 255.0
    return (x - _MEAN) / _STD


def extract_features(params, images_bgr_u8, compute_dtype=jnp.float32):
    """fnet + cnet with tanh/relu split (droid_net.py:154-169).

    Returns (fmap [N,h,w,128], net [N,h,w,128], inp [N,h,w,128])."""
    x = normalize_images(images_bgr_u8).astype(compute_dtype)
    fmap = basic_encoder(params, "fnet", x, "instance")
    ctx = basic_encoder(params, "cnet", x, "none")
    net, inp = jnp.split(ctx, 2, axis=-1)
    return fmap, jnp.tanh(net), jax.nn.relu(inp)


# ---------------------------------------------------------------------------
# ConvGRU with global context gates (gru.py:5-32)
# ---------------------------------------------------------------------------

def conv_gru(params, net, inp):
    """net [E,h,w,128], inp [E,h,w,192+128] concat of (corr, flow) features
    plus context; returns updated net.

    MXU packing: the z and r gates share their input, so their 3x3 convs are
    merged into one 256-channel conv; likewise the three 1x1 global-context
    convs become one 384-channel matmul (same math as gru.py:19-32)."""
    net_inp = jnp.concatenate([net, inp], axis=-1)
    glo = jax.nn.sigmoid(conv2d(params, "update.gru.w", net)) * net
    glo = jnp.mean(glo, axis=(1, 2), keepdims=True)

    def merged(names, x):
        w = jnp.concatenate([params[n + ".weight"] for n in names], axis=-1)
        b = jnp.concatenate([params[n + ".bias"] for n in names], axis=-1)
        return conv2d({"m.weight": w, "m.bias": b}, "m", x)

    glo_zrq = merged(["update.gru.convz_glo", "update.gru.convr_glo",
                      "update.gru.convq_glo"], glo)
    gz, gr, gq = jnp.split(glo_zrq, 3, axis=-1)

    zr = merged(["update.gru.convz", "update.gru.convr"], net_inp)
    z = jax.nn.sigmoid(zr[..., :128] + gz)
    r = jax.nn.sigmoid(zr[..., 128:] + gr)
    q = jnp.tanh(conv2d(params, "update.gru.convq",
                        jnp.concatenate([r * net, inp], axis=-1)) + gq)
    return (1.0 - z) * net + z * q


# ---------------------------------------------------------------------------
# UpdateModule (droid_net.py:78-143) + GraphAgg (droid_net.py:44-75)
# ---------------------------------------------------------------------------

def update_module(params, net, inp, corr, flow=None, ii=None, num_frames=None,
                  frame_slots=None):
    """RAFT-SLAM update operator on a batch of edges.

    net/inp [E,h,w,128], corr [E,h,w,196], flow [E,h,w,4].
    When ``ii`` (edge source frames, [E]) and ``num_frames`` are given, also
    runs GraphAgg and returns per-frame damping/upmask aggregated with a
    segment-mean over edges sharing a source frame.

    Returns (net, delta [E,h,w,2], weight [E,h,w,2][, eta [F,h,w],
    upmask [F,h,w,576]]).
    """
    E, h, w, _ = net.shape
    if flow is None:
        flow = jnp.zeros((E, h, w, 4), net.dtype)

    c = jax.nn.relu(conv2d(params, "update.corr_encoder.0", corr))
    c = jax.nn.relu(conv2d(params, "update.corr_encoder.2", c))
    f = jax.nn.relu(conv2d(params, "update.flow_encoder.0", flow))
    f = jax.nn.relu(conv2d(params, "update.flow_encoder.2", f))

    net = conv_gru(params, net, jnp.concatenate([inp, c, f], axis=-1))

    d = jax.nn.relu(conv2d(params, "update.delta.0", net))
    delta = gradient_clip(conv2d(params, "update.delta.2", d))
    s = jax.nn.relu(conv2d(params, "update.weight.0", net))
    weight = jax.nn.sigmoid(gradient_clip(conv2d(params, "update.weight.2", s)))

    if ii is None:
        return net, delta, weight

    eta, upmask = graph_agg(params, net, ii, num_frames)
    return net, delta, weight, eta, upmask


def graph_agg(params, net, ii, num_frames):
    """Segment-mean over edges with the same source frame, then damping and
    upsample-mask heads (droid_net.py:44-75). ``ii`` must already be
    zero-based frame slots in [0, num_frames)."""
    x = jax.nn.relu(conv2d(params, "update.agg.conv1", net))
    ones = jnp.ones((x.shape[0],), x.dtype)
    counts = jax.ops.segment_sum(ones, ii, num_segments=num_frames)
    sums = jax.ops.segment_sum(x, ii, num_segments=num_frames)
    mean = sums / jnp.maximum(counts, 1.0)[:, None, None, None]

    y = jax.nn.relu(conv2d(params, "update.agg.conv2", mean))
    eta = jax.nn.softplus(gradient_clip(conv2d(params, "update.agg.eta.0", y)))
    upmask = conv2d(params, "update.agg.upmask.0", y)
    return 0.01 * eta[..., 0], upmask


# ---------------------------------------------------------------------------
# Convex upsampling (droid_net.py:21-41)
# ---------------------------------------------------------------------------

def cvx_upsample(data, mask):
    """data [N,h,w,dim], mask [N,h,w,9*64] -> [N,8h,8w,dim].

    mask channels are laid out [9, 8, 8] (neighbor, y-subpixel, x-subpixel),
    neighbors in row-major (dy,dx) order matching torch F.unfold.
    """
    N, h, w, dim = data.shape
    mask = mask.reshape(N, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = jnp.stack(
        [pad[:, 1 + dy:1 + dy + h, 1 + dx:1 + dx + w] for dy in (-1, 0, 1)
         for dx in (-1, 0, 1)], axis=3)  # [N,h,w,9,dim]

    up = jnp.einsum("nhwkyx,nhwkd->nhwyxd", mask, patches,
                    precision="highest")  # [N,h,w,8,8,dim]
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(N, 8 * h, 8 * w, dim)


def upsample_disp(disp, mask):
    """disp [N,h,w] -> [N,8h,8w] (droid_net.py:37-41)."""
    return cvx_upsample(disp[..., None], mask)[..., 0]


# ---------------------------------------------------------------------------
# parameter initialization (shapes identical to the torch state_dict)
# ---------------------------------------------------------------------------

def _encoder_shapes(prefix, out_dim):
    shp = {f"{prefix}.conv1": (7, 7, 3, DIM), f"{prefix}.conv2": (1, 1, 4 * DIM, out_dim)}
    dims = [(DIM, DIM, 1), (DIM, 2 * DIM, 2), (2 * DIM, 4 * DIM, 2)]
    for li, (cin, cout, stride) in enumerate(dims, start=1):
        for blk in range(2):
            ci = cin if blk == 0 else cout
            base = f"{prefix}.layer{li}.{blk}"
            shp[f"{base}.conv1"] = (3, 3, ci, cout)
            shp[f"{base}.conv2"] = (3, 3, cout, cout)
            if blk == 0 and stride != 1:
                shp[f"{base}.downsample.0"] = (1, 1, ci, cout)
    return shp


def param_shapes():
    shp = {}
    shp.update(_encoder_shapes("fnet", 128))
    shp.update(_encoder_shapes("cnet", 256))
    shp.update({
        "update.corr_encoder.0": (1, 1, CORR_PLANES, 128),
        "update.corr_encoder.2": (3, 3, 128, 128),
        "update.flow_encoder.0": (7, 7, 4, 128),
        "update.flow_encoder.2": (3, 3, 128, 64),
        "update.weight.0": (3, 3, 128, 128),
        "update.weight.2": (3, 3, 128, 2),
        "update.delta.0": (3, 3, 128, 128),
        "update.delta.2": (3, 3, 128, 2),
        "update.gru.convz": (3, 3, 128 + 320, 128),
        "update.gru.convr": (3, 3, 128 + 320, 128),
        "update.gru.convq": (3, 3, 128 + 320, 128),
        "update.gru.w": (1, 1, 128, 128),
        "update.gru.convz_glo": (1, 1, 128, 128),
        "update.gru.convr_glo": (1, 1, 128, 128),
        "update.gru.convq_glo": (1, 1, 128, 128),
        "update.agg.conv1": (3, 3, 128, 128),
        "update.agg.conv2": (3, 3, 128, 128),
        "update.agg.eta.0": (3, 3, 128, 1),
        "update.agg.upmask.0": (1, 1, 128, 8 * 8 * 9),
    })
    return shp


def init_params(key, dtype=jnp.float32):
    """Random init with the reference's scheme (kaiming fan_out, zero bias)."""
    params = {}
    for name, (kh, kw, cin, cout) in sorted(param_shapes().items()):
        key, sub = jax.random.split(key)
        params[name + ".weight"] = kaiming_conv(sub, kh, kw, cin, cout, dtype)
        params[name + ".bias"] = jnp.zeros((cout,), dtype)
    return params
