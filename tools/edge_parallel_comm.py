"""Measure the edge-parallel frontend's per-iteration collective traffic.

VERDICT r3 item 4 (tail): the 2-chip projection in ROOFLINE.md claimed the
all-gather/psum overhead is negligible vs the compute saved, but the claim
was analytic. This tool compiles `parallel.frontend.edge_parallel_update`
at the REAL bench shapes (320x512 input -> 40x64 features, 48-edge bucket,
20-frame window) on a virtual CPU mesh and extracts every collective the
compiler actually emitted — op kind, tensor shape, bytes moved — from the
lowered module, then projects the ICI wire time at v5e link bandwidth.

This is exact (the collectives and their payloads are the same ops XLA:TPU
executes; only their wall-time differs per interconnect), so the projection
is data, not assertion.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/edge_parallel_comm.py [--mesh 2 8] [--edges 48]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")
if "--xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "f64": 8, "s64": 8, "u8": 1, "s8": 1}


def collective_bytes(hlo_text):
    """Parse per-shard payload bytes of every collective in an HLO module."""
    out = []
    # matches e.g.:  %all-gather.3 = f32[48,2,2560] all-gather(...)
    pat = re.compile(
        r"=\s*\(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
        r"(all-gather|all-reduce|collective-permute|reduce-scatter"
        r"|all-to-all)\(")
    for m in pat.finditer(hlo_text):
        dt, dims, kind = m.group(1), m.group(2), m.group(3)
        n = int(np.prod([int(d) for d in dims.split(",") if d])) if dims \
            else 1
        out.append((kind, dt, dims, n * DTYPE_BYTES.get(dt, 4)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, nargs="+", default=[2, 8])
    ap.add_argument("--edges", type=int, default=48)
    ap.add_argument("--height", type=int, default=320)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--window", type=int, default=20)
    ap.add_argument("--link_gbps", type=float, default=45.0,
                    help="assumed per-direction ICI link bandwidth, GB/s "
                         "(v5e ballpark)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from droid_slam_tpu.models import nets
    from droid_slam_tpu.ops import corr as corr_ops
    from droid_slam_tpu.parallel import frontend as pf

    h, w = args.height // 8, args.width // 8
    hw = h * w
    EB, NWF = args.edges, args.window
    rng = np.random.default_rng(0)
    params = nets.init_params(jax.random.PRNGKey(0))

    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    fm1 = (f(EB, h, w, 128) / 8).astype(jnp.bfloat16)
    fm2 = (f(EB, h, w, 128) / 8).astype(jnp.bfloat16)
    pyr = tuple(p.astype(jnp.bfloat16)
                for p in corr_ops.build_pyramid_cm(fm1, fm2))
    poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                     (NWF + 1, 1))
    disps = jnp.abs(f(NWF + 1, h, w)) + 0.5
    intr = jnp.broadcast_to(jnp.asarray([320.0, 320.0, w / 2, h / 2]),
                            (NWF + 1, 4))
    inps = f(NWF + 1, h, w, 128).astype(jnp.bfloat16)
    nets_e = f(EB, h, w, 128).astype(jnp.bfloat16)
    target = f(EB, 2, hw)
    weight = jnp.abs(f(EB, 2, hw))
    ii = jnp.asarray(rng.integers(0, NWF, EB))
    jj = jnp.asarray(rng.integers(0, NWF, EB))
    valid = jnp.ones(EB, bool)

    for n in args.mesh:
        mesh = pf.edge_parallel_mesh(n)
        sh = lambda t: pf.shard_edges(mesh, t)

        def run():
            return pf.edge_parallel_update(
                mesh, params, poses, disps, intr, inps, sh(pyr), sh(nets_e),
                sh(target), sh(weight), sh(ii), sh(jj), sh(valid),
                jnp.asarray(0), nw=NWF, lookup_impl="dense_cm",
                compute_upmask=False)

        lowered = jax.jit(run).lower()
        txt = lowered.compile().as_text()
        cols = collective_bytes(txt)
        total = sum(b for *_, b in cols)
        # tiled all-gather payload per link ~ (n-1)/n of the gathered size;
        # report the simple full-size upper bound
        t_us = total / (args.link_gbps * 1e9) * 1e6
        print(f"mesh={n}: {len(cols)} collectives, "
              f"{total / 1e6:.2f} MB/iteration (upper bound), "
              f"~{t_us:.0f} us at {args.link_gbps:.0f} GB/s/link")
        for kind, dt, dims, b in cols:
            print(f"    {kind:20s} {dt}[{dims}]  {b / 1e6:.3f} MB")


if __name__ == "__main__":
    main()
