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

def _merged_w(params, names):
    w = jnp.concatenate([params[n + ".weight"] for n in names], axis=-1)
    b = jnp.concatenate([params[n + ".bias"] for n in names], axis=-1)
    return w, b


def _conv_nobias(x, w, padding=None):
    return conv2d({"m.weight": w.astype(x.dtype)}, "m", x, padding=padding)


def _glo_gates(params, net):
    """Global-context gate biases gz/gr/gq [E,1,1,128] each.

    The pooled context is [E,128]; running the three 1x1 context convs
    through the conv machinery at 1x1 spatial triggers pathological layouts
    on TPU — a plain [E,128]@[128,384] matmul is the same math
    (gru.py:24-31)."""
    glo = jax.nn.sigmoid(conv2d(params, "update.gru.w", net)) * net
    glo = jnp.mean(glo.astype(jnp.float32), axis=(1, 2)).astype(net.dtype)
    w, b = _merged_w(params, ["update.gru.convz_glo", "update.gru.convr_glo",
                              "update.gru.convq_glo"])
    zrq = glo @ w.reshape(w.shape[2], w.shape[3]).astype(glo.dtype) \
        + b.astype(glo.dtype)
    zrq = zrq[:, None, None, :]
    return zrq[..., :128], zrq[..., 128:256], zrq[..., 256:]


def gru_context_pre(params, inp):
    """Iteration-invariant GRU input contributions of the context features.

    conv(concat(net, inp, c, f), W) == conv(net, W[:, :, :128])
    + conv(inp, W[:, :, 128:256]) + conv(cf, W[:, :, 256:]): `inp` is fixed
    across the frontend's GRU+DBA iterations, so its convz/convr/convq
    contributions are computed ONCE per frame program and carried as loop
    constants instead of re-contracted (and re-concatenated) every iteration
    (~95 GFLOP + two 43 MB concat materializations per iteration saved).
    """
    wzr, _ = _merged_w(params, ["update.gru.convz", "update.gru.convr"])
    wq = params["update.gru.convq.weight"]
    pre_zr = _conv_nobias(inp, wzr[:, :, 128:256])
    pre_q = _conv_nobias(inp, wq[:, :, 128:256].astype(inp.dtype))
    return pre_zr, pre_q


# DROID_GRU_PALLAS: '' / '0' = off (default), '1' = compiled Pallas gate
# epilogues, 'interpret' = Pallas interpret mode (CPU parity tests).
# Read ONCE at import (ADVICE r3): the value is baked into compiled
# executables and is not part of any jit cache key, so a post-import change
# would silently do nothing — freezing it at import makes that explicit
# (same pattern as DROID_FUSED_FRAME in slam/fused_frame.py).
#
# Default is OFF: the fused epilogues measured SLOWER end-to-end than XLA's
# loop fusions on real v5e (16.49 vs 17.42 kf/s, round-4 A/B — the per-edge
# grid at (1,40,64,C) blocks underuses the ~819 GB/s HBM pipeline). Kept as
# an env-gated experiment; see BENCH_NOTES round-4 log.
_GRU_PALLAS_ENV = __import__("os").environ.get("DROID_GRU_PALLAS", "")

# DROID_GRU_QFUSE: q-path analog of the shipped zr-conv fusion (one 320->128
# conv over [r*net | inp] instead of conv(r*net) + a separate cfq round
# trip). Read once at import for the same compile-key-freezing reason as
# DROID_GRU_PALLAS above. Default ON: measured 18.10 median (18.10/18.25
# steady windows) vs 16.92-16.96 for the split form on real v5e — the
# single 320-ch conv lets XLA fuse the whole q epilogue into one MXU
# kernel chain instead of two convs bridged by an elementwise add
# (round-4 A/B, BENCH_NOTES). DROID_GRU_QFUSE=0 restores the split form.
_GRU_QFUSE = __import__("os").environ.get("DROID_GRU_QFUSE", "1") == "1"


def _gru_pallas_mode():
    env = _GRU_PALLAS_ENV
    if env == "interpret":
        return "interpret"
    if env == "1":
        # compiled Mosaic lowering only exists on TPU; on CPU backends fall
        # back to interpret instead of crashing (ADVICE r3)
        return "on" if jax.default_backend() == "tpu" else "interpret"
    return ""


def conv_gru(params, net, inp, pre=None, pallas_ok=False):
    """net [E,h,w,128]; without ``pre``: inp [E,h,w,320] = concat of
    (context, corr-features, flow-features); with ``pre`` (gru_context_pre):
    inp [E,h,w,192] = concat of (corr, flow) features only. Returns updated
    net.

    MXU packing: the z and r gates share their input, so their 3x3 convs are
    merged into one 256-channel conv; likewise the three 1x1 global-context
    convs become one 384-channel matmul (same math as gru.py:19-32).

    ``pallas_ok``: the caller is inference-only (no VJP needed) — allows the
    fused Pallas gate epilogues (ops/gru_pallas.py) which stream each
    operand once instead of XLA's ~50%-of-HBM loop fusions."""
    gz, gr, gq = _glo_gates(params, net)
    wzr, bzr = _merged_w(params, ["update.gru.convz", "update.gru.convr"])
    wq = params["update.gru.convq.weight"]
    bq = params["update.gru.convq.bias"]

    if pre is None:
        net_inp = jnp.concatenate([net, inp], axis=-1)
        zr = _conv_nobias(net_inp, wzr) + bzr.astype(net.dtype)
        z = jax.nn.sigmoid(zr[..., :128] + gz)
        r = jax.nn.sigmoid(zr[..., 128:] + gr)
        q = jnp.tanh(conv2d(params, "update.gru.convq",
                            jnp.concatenate([r * net, inp], axis=-1)) + gq)
        return (1.0 - z) * net + z * q

    pre_zr, pre_q = pre

    mode = _gru_pallas_mode() if pallas_ok else ""
    if mode:
        # scoped-VMEM guard (ADVICE r3): each grid step holds full
        # (1,h,w,C) planes (~1024 bf16 input lanes + f32 temporaries), so
        # large feature planes blow Mosaic's ~16 MiB scoped-VMEM limit.
        # 40x64 (the 320x512 EuRoC shape) is compile-verified on real v5e;
        # gate at 2x that and fall back to the XLA path beyond it.
        if net.shape[1] * net.shape[2] > 5120:
            mode = ""
    if mode:
        from ..ops import gru_pallas
        interp = mode == "interpret"
        # the zr and q convs both consume the same corr/flow features: one
        # merged 192->384 conv (exact: concatenated output channels of a
        # shared input) instead of two launches + two reads of `inp`
        wcf = jnp.concatenate([wzr[:, :, 256:], wq[:, :, 256:]], axis=-1)
        cf = _conv_nobias(inp, wcf.astype(inp.dtype))            # [E,h,w,384]
        gzr = (jnp.concatenate([gz, gr], axis=-1)[:, 0, 0, :]
               + bzr.astype(net.dtype))                          # [E,256]
        gqb = gq[:, 0, 0, :] + bq.astype(net.dtype)              # [E,128]
        zrc = _conv_nobias(net, wzr[:, :, :128])
        z, rnet = gru_pallas.gru_epilogue_a(zrc, cf, pre_zr, net, gzr,
                                            interpret=interp)
        qc = _conv_nobias(rnet, wq[:, :, :128].astype(net.dtype))
        return gru_pallas.gru_epilogue_b(qc, cf, pre_q, net, z, gqb,
                                         interpret=interp)

    # ONE 320->256 conv computes the complete zr contraction (the net and
    # corr/flow blocks of convz/convr over their concatenated inputs): the
    # 3-way elementwise zr add (zrc + cf-slice + pre_zr) of the two-conv
    # form collapses into this conv's output epilogue — one fewer
    # [E,h,w,256] HBM round trip per iteration, identical FLOPs (the same
    # weight columns contract the same inputs, now in one f32 accumulator).
    x = jnp.concatenate([net, inp], axis=-1)                     # [E,h,w,320]
    wzr_x = jnp.concatenate([wzr[:, :, :128], wzr[:, :, 256:]], axis=2)
    zr = _conv_nobias(x, wzr_x.astype(net.dtype)) + pre_zr + bzr.astype(net.dtype)
    z = jax.nn.sigmoid(zr[..., :128] + gz)
    r = jax.nn.sigmoid(zr[..., 128:] + gr)
    if _GRU_QFUSE:
        # same fusion for the q contraction: ONE 320->128 conv over
        # [r*net | inp] (the r*net and corr/flow weight columns of convq in
        # one f32 accumulator) — the separate cfq [E,h,w,128] HBM round
        # trip collapses into this conv's input/epilogue. Identical FLOPs;
        # f32-reassociation-level equal (pinned in tests/test_nets.py).
        wq_x = jnp.concatenate([wq[:, :, :128], wq[:, :, 256:]], axis=2)
        q = jnp.tanh(_conv_nobias(
            jnp.concatenate([r * net, inp], axis=-1),
            wq_x.astype(net.dtype))
            + pre_q + bq.astype(net.dtype) + gq)
    else:
        cfq = _conv_nobias(inp, wq[:, :, 256:].astype(inp.dtype))
        q = jnp.tanh(_conv_nobias(r * net, wq[:, :, :128].astype(net.dtype))
                     + cfq
                     + pre_q + bq.astype(net.dtype) + gq)
    return (1.0 - z) * net + z * q


# ---------------------------------------------------------------------------
# UpdateModule (droid_net.py:78-143) + GraphAgg (droid_net.py:44-75)
# ---------------------------------------------------------------------------

def update_module(params, net, inp, corr, flow=None, ii=None, num_frames=None,
                  frame_slots=None, pre=None, compute_upmask=True,
                  psum_axis=None, pallas_ok=False):
    """RAFT-SLAM update operator on a batch of edges.

    net/inp [E,h,w,128], corr [E,h,w,196], flow [E,h,w,4].
    When ``ii`` (edge source frames, [E]) and ``num_frames`` are given, also
    runs GraphAgg and returns per-frame damping/upmask aggregated with a
    segment-mean over edges sharing a source frame.

    ``pre`` (gru_context_pre over inp) replaces the per-call context
    contraction; ``compute_upmask=False`` skips the upsample-mask head
    (returned as None) — the frontend only consumes the LAST iteration's
    upmask, so the iteration loop defers it (state/graph.py) instead of
    writing a 94 MB [F,h,w,576] tensor every iteration.

    Returns (net, delta [E,h,w,2], weight [E,h,w,2][, eta [F,h,w],
    upmask [F,h,w,576] | None]).
    """
    E, h, w, _ = net.shape
    if flow is None:
        flow = jnp.zeros((E, h, w, 4), net.dtype)

    if corr.ndim == 3:
        # channel-major corr [E, C, HW] (pixels in lanes, the corr lookup's
        # natural layout — state/graph.py feeds this under lookup_impl
        # "dense_cm"). The 1x1 encoder conv is a plain matmul, and feeding
        # it channel-major absorbs the layout transpose into the MXU
        # contraction: the ~1.4 ms/frame of [E,h,w,49] relayout copies the
        # NHWC boundary otherwise costs disappear (profiled on v5e).
        w0 = params["update.corr_encoder.0.weight"]
        w0 = w0.reshape(w0.shape[2], w0.shape[3]).astype(corr.dtype)
        b0 = params["update.corr_encoder.0.bias"].astype(corr.dtype)
        c = jax.nn.relu(jnp.einsum("ecp,cd->epd", corr, w0,
                                   preferred_element_type=jnp.float32)
                        .astype(corr.dtype) + b0)
        c = c.reshape(E, h, w, -1)
    else:
        c = jax.nn.relu(conv2d(params, "update.corr_encoder.0", corr))
    c = jax.nn.relu(conv2d(params, "update.corr_encoder.2", c))
    f = jax.nn.relu(conv2d(params, "update.flow_encoder.0", flow))
    f = jax.nn.relu(conv2d(params, "update.flow_encoder.2", f))

    if pre is None:
        net = conv_gru(params, net, jnp.concatenate([inp, c, f], axis=-1))
    else:
        net = conv_gru(params, net, jnp.concatenate([c, f], axis=-1), pre=pre,
                       pallas_ok=pallas_ok)

    # delta.0 and weight.0 share their input — one merged 128->256 MXU conv;
    # the 2-channel second convs are merged block-diagonally into one
    # 256->4 conv (2-lane outputs lower to pathological layouts on TPU;
    # one such op instead of two). Zero cross-blocks keep the math exact.
    wd0, bd0 = _merged_w(params, ["update.delta.0", "update.weight.0"])
    ds = jax.nn.relu(_conv_nobias(jnp.asarray(net), wd0) + bd0.astype(net.dtype))
    # barrier: without it XLA fuses this 36-GFLOP conv backwards into the
    # 4-channel head output's elementwise fusion and runs the whole chain
    # on the VPU at ~16 TFLOP/s (profiled 3.8 ms/frame); materializing ds
    # costs one 63 MB round trip and keeps the conv on the MXU
    ds = jax.lax.optimization_barrier(ds)
    w2 = params["update.weight.2.weight"]
    d2 = params["update.delta.2.weight"]
    # out-channels padded 4 -> 8: a 4-lane NHWC conv output forces XLA
    # into a pathological minor-batch T(4,128) VPU fusion (measured 125 ms
    # standalone / 2.2 ms in-program for a 0.25-GFLOP op); at 8 channels it
    # lowers to a normal MXU conv (0.15 ms) and the pad columns are sliced
    # off before the heads
    blk = jnp.zeros(d2.shape[:2] + (256, 8), d2.dtype)
    blk = blk.at[:, :, :128, :2].set(d2).at[:, :, 128:, 2:4].set(w2)
    bias4 = jnp.concatenate([params["update.delta.2.bias"],
                             params["update.weight.2.bias"]])

    head = gradient_clip(
        _conv_nobias(ds, blk)[..., :4] + bias4.astype(net.dtype))
    delta = head[..., :2]
    weight = jax.nn.sigmoid(head[..., 2:])

    if ii is None:
        return net, delta, weight

    eta, upmask = graph_agg(params, net, ii, num_frames,
                            compute_upmask=compute_upmask,
                            psum_axis=psum_axis)
    return net, delta, weight, eta, upmask


def graph_agg(params, net, ii, num_frames, compute_upmask=True,
              psum_axis=None):
    """Segment-mean over edges with the same source frame, then damping and
    upsample-mask heads (droid_net.py:44-75). ``ii`` must already be
    zero-based frame slots in [0, num_frames).

    ``psum_axis``: mesh axis name when the edge dim is sharded (shard_map
    edge-parallel frontend, parallel/frontend.py) — the segment sums and
    counts are reduced across shards so the mean spans ALL edges of a
    frame, exactly as in the unsharded program (up to psum reassociation).
    """
    x = jax.nn.relu(conv2d(params, "update.agg.conv1", net))
    ones = jnp.ones((x.shape[0],), x.dtype)
    counts = jax.ops.segment_sum(ones, ii, num_segments=num_frames)
    sums = jax.ops.segment_sum(x, ii, num_segments=num_frames)
    if psum_axis is not None:
        counts = jax.lax.psum(counts, psum_axis)
        sums = jax.lax.psum(sums, psum_axis)
    mean = sums / jnp.maximum(counts, 1.0)[:, None, None, None]

    y = jax.nn.relu(conv2d(params, "update.agg.conv2", mean))
    eta = jax.nn.softplus(gradient_clip(conv2d(params, "update.agg.eta.0", y)))
    upmask = (conv2d(params, "update.agg.upmask.0", y) if compute_upmask
              else None)
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
