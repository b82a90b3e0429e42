"""Per-frame FLOP accounting for the steady-state tracking loop -> MFU.

Counts model FLOPs by compiling the framework's OWN stage programs (CPU
backend, identical HLO math as the TPU frame program) at the live bench
shapes and summing XLA's cost analysis:

  1x   fnet+cnet encode of the incoming frame (models/nets.py)
  1x   corr-volume build for the new-edge bucket (ops/corr.py)
  Kx   per GRU/BA iteration (frontend iters1+iters2, typically 3+2):
         reprojection of all active slots   (geom/projective.py)
         corr pyramid lookup                (ops/corr.py dense impl)
         update operator + GraphAgg         (models/nets.py)
         windowed 2-GN bundle adjustment    (ba/inference.py)

XLA's cost analysis cannot see through the frame program's DYNAMIC
fori_loop iteration counts (that trick keeps compile keys frozen on the
tunnel deployment), so the loop body is costed once here and multiplied by
the host-known iteration count — which is exactly what the device executes.

Run standalone:
  JAX_PLATFORM_NAME=cpu python tools/flops_model.py --height 320 --width 512
or via bench.py (which passes the live bucket sizes and folds the result
into its JSON line as `mfu`).
"""

import argparse
import json
import os
import sys


def _flops(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def steady_frame_flops(height=320, width=512, slots=48, ba_edges=64,
                       window=32, rmax=16, new_edges=16, iters=5,
                       lookup_impl="dense"):
    """Returns (total_flops_per_frame, breakdown dict). Shapes mirror the
    bench steady state: `slots` = compacted slot capacity, `ba_edges` /
    `window` / `rmax` = the sticky BA plan buckets, `new_edges` = the
    sticky per-frame edge-add bucket."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from droid_slam_tpu.ba import inference as ba_inf
    from droid_slam_tpu.geom import projective as pops
    from droid_slam_tpu.lie import se3
    from droid_slam_tpu.models import nets
    from droid_slam_tpu.ops import corr as corr_ops

    H, W = height, width
    h, w = H // 8, W // 8
    hw = h * w
    E = slots
    rng = np.random.default_rng(0)
    params = nets.init_params(jax.random.PRNGKey(0))

    def cost(fn, *args):
        return _flops(jax.jit(fn).lower(*args).compile())

    br = {}

    img = jnp.asarray(rng.integers(0, 255, size=(1, H, W, 3)), jnp.uint8)
    br["encode"] = cost(
        lambda p, x: nets.extract_features(p, x, jnp.bfloat16), params, img)

    fm = jnp.asarray(rng.normal(size=(new_edges, h, w, 128)), jnp.bfloat16)
    br["volume_build_new_edges"] = cost(corr_ops.build_pyramid, fm, fm)

    fm_e = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.bfloat16)
    pyr = corr_ops.build_pyramid(fm_e, fm_e)
    coords = jnp.asarray(
        rng.uniform(0, [w, h], size=(E, h, w, 2)).astype(np.float32))
    br["corr_lookup"] = iters * cost(
        lambda py, c: corr_ops.lookup_pyramid(py, c, impl=lookup_impl),
        pyr, coords)

    net = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.bfloat16)
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)), jnp.bfloat16)
    cor = jnp.asarray(rng.normal(size=(E, h, w, 196)), jnp.bfloat16)
    mot = jnp.asarray(rng.normal(size=(E, h, w, 4)), jnp.bfloat16)
    ii = jnp.asarray(rng.integers(0, window, size=E))
    # [:4] drops the GraphAgg upmask output: with upsampling off (the bench
    # config) the frame program never uses it and XLA DCEs its convs —
    # costing it here would overcount by ~2x
    br["update_module"] = iters * cost(
        lambda p, *a: nets.update_module(p, *a, ii=ii,
                                         num_frames=window)[:4],
        params, net, inp, cor, mot)

    B = window * 2
    poses = se3.exp(jnp.asarray(
        0.01 * rng.normal(size=(B, 6)).astype(np.float32)))
    disps = jnp.ones((B, h, w), jnp.float32)
    ii_np = rng.integers(1, window - 2, size=ba_edges)
    jj_np = rng.integers(1, window - 2, size=ba_edges)
    br["reproject"] = iters * cost(
        pops.projective_transform, poses, disps,
        jnp.broadcast_to(jnp.asarray([w * 0.8, w * 0.8, w / 2, h / 2],
                                     jnp.float32), (B, 4)),
        jnp.asarray(ii_np), jnp.asarray(jj_np))

    shape, plan = ba_inf.build_plan(ii_np, jj_np, 2, window - 2, iters=2,
                                    rmax=rmax)
    sens = jnp.zeros((B, h, w), jnp.float32)
    damp = 1e-6 * jnp.ones((B, h, w), jnp.float32)
    intr = jnp.asarray([w * 0.8, w * 0.8, w / 2, h / 2], jnp.float32)
    tgt = jnp.asarray(rng.uniform(0, w, size=(shape.edges, 2, hw))
                      .astype(np.float32))
    wgt = jnp.ones((shape.edges, 2, hw), jnp.float32)
    br["ba_2gn"] = iters * _flops(
        jax.jit(ba_inf.ba_windowed, static_argnames=("shape",))
        .lower(shape, poses, disps, sens, damp, intr, tgt, wgt, plan,
               1e-4, 0.1).compile())

    return sum(br.values()), br


# peak dense-matmul throughput by device kind (bf16 FLOP/s); MFU is
# reported against the bf16 ceiling — the conventional denominator — even
# though the BA/geometry islands run fp32 (so their attainable peak is
# lower and true utilization is slightly better than reported)
PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e: 197 bf16 TFLOP/s per chip
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
    "cpu": 1e12,             # nominal, for smoke runs only
}


def peak_for(device_kind: str) -> float:
    for k, v in PEAK_FLOPS.items():
        if device_kind.lower().startswith(k.lower()):
            return v
    return PEAK_FLOPS["cpu"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--slots", type=int, default=48)
    p.add_argument("--ba_edges", type=int, default=64)
    p.add_argument("--window", type=int, default=32)
    p.add_argument("--rmax", type=int, default=16)
    p.add_argument("--new_edges", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--lookup_impl", default="dense")
    args = p.parse_args()

    total, br = steady_frame_flops(
        args.height, args.width, args.slots, args.ba_edges, args.window,
        args.rmax, args.new_edges, args.iters, args.lookup_impl)
    print(json.dumps({"flops_per_frame": total,
                      "breakdown": {k: round(v / 1e9, 3) for k, v in
                                    br.items()}}))


if __name__ == "__main__":
    os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    main()
