"""Microbenchmark of the per-iteration hot-path pieces at live bench shapes.

Two deployment gotchas handled here:
  * the axon tunnel memoizes identical executions — every timed call CHAINS
    its inputs from the previous output;
  * closed-over device arrays become HLO constants and get SERIALIZED INTO
    THE REMOTE COMPILE REQUEST (an 840 MB corr pyramid closure draws an
    HTTP 413 from the compile service) — all big arrays are jit ARGUMENTS.

Run alone on the TPU:  python tools/bench_iter.py [--corr] [--ba] [--gru]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_tpu.models import nets
from droid_slam_tpu.ops import corr as corr_ops
from droid_slam_tpu.ba import inference as ba_inf
from droid_slam_tpu.ba import edge_terms
from droid_slam_tpu.geom import projective as pops
from droid_slam_tpu.lie import se3

E, H8, W8 = 48, 40, 64
HW = H8 * W8
NW = 32
B = 64  # keyframe buffer


def _sync(x):
    """Force REAL completion: fetch a scalar to the host (block_until_ready
    on a tunneled buffer can return before the device has executed)."""
    leaf = jax.tree.leaves(x)[0]
    jax.device_get(leaf.ravel()[0])


def timeit(name, fn, *args, n=16, chain=0):
    """fn(*args) -> new value for args[chain]; times steady-state calls.

    Reports the MARGINAL cost per call between two loop lengths, with a
    host readback as the barrier — immune to tunnel pipelining/laziness.
    """
    args = list(args)

    def run(k):
        a = list(args)
        tic = time.perf_counter()
        for _ in range(k):
            a[chain] = fn(*a)
        _sync(a[chain])
        return time.perf_counter() - tic

    run(2)  # compile + warm
    t_small = min(run(2), run(2))
    t_big = min(run(2 + n), run(2 + n))
    dt = (t_big - t_small) / n * 1000
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return dt


def make_data(seed=0):
    rng = np.random.default_rng(seed)
    fm = jnp.asarray(rng.normal(size=(E, H8, W8, 128)).astype(np.float32) / 8,
                     jnp.bfloat16)
    pyr = jax.jit(corr_ops.build_pyramid)(fm, fm)
    coords = jnp.asarray(
        rng.uniform([4, 4], [W8 - 4, H8 - 4], size=(E, HW, 2))
        .astype(np.float32))
    return rng, pyr, coords


def bench_corr(impls=("dense", "rows", "tent", "onehot")):
    rng, pyr, coords = make_data()
    for impl in impls:
        @jax.jit
        def step(c, pyr, impl=impl):
            outs = []
            for lvl, vol in enumerate(pyr):
                outs.append(corr_ops._lookup_level_impl(
                    vol, c / (2.0 ** lvl), corr_ops.RADIUS, impl))
            out = jnp.concatenate(outs, axis=-1)
            # consume EVERY output channel or XLA dead-code-eliminates
            # the untouched taps/levels out of the timed program
            return c + 1e-6 * jnp.mean(out)
        try:
            timeit(f"corr lookup 4-lvl [{impl}]", step, coords, pyr)
        except Exception as e:
            print(f"corr lookup [{impl}] FAILED: {str(e)[:100]}", flush=True)

    @jax.jit
    def l0(c, vol):
        out = corr_ops._lookup_level_impl(vol, c, corr_ops.RADIUS, "dense")
        return c + 1e-6 * jnp.mean(out)
    timeit("corr lookup L0 only [dense]", l0, coords, pyr[0])


def bench_corr_cm():
    """Channel-major (pixels-in-lanes) lookup vs the standard dense path."""
    rng, pyr, coords = make_data()
    fm = jnp.asarray(rng.normal(size=(E, H8, W8, 128)).astype(np.float32) / 8,
                     jnp.bfloat16)
    pyr_cm = jax.jit(corr_ops.build_pyramid_cm)(fm, fm)

    @jax.jit
    def cm(c, pyr_cm):
        out = corr_ops.lookup_pyramid_cm(pyr_cm, c, corr_ops.RADIUS)
        return c + 1e-6 * jnp.mean(out.astype(jnp.float32))
    timeit("corr lookup 4-lvl [cm, ch-major out]", cm, coords, pyr_cm)

    @jax.jit
    def cm_t(c, pyr_cm):
        out = corr_ops.lookup_pyramid_cm(pyr_cm, c, corr_ops.RADIUS)
        out = jnp.transpose(out, (0, 2, 1))  # [E,HW,196] standard layout
        return c + 1e-6 * jnp.mean(out.astype(jnp.float32))
    timeit("corr lookup 4-lvl [cm + transpose]", cm_t, coords, pyr_cm)

    @jax.jit
    def dense(c, pyr):
        outs = [corr_ops._lookup_level_impl(v, c / (2.0 ** l),
                                            corr_ops.RADIUS, "dense",
                                            out_dtype=jnp.bfloat16)
                for l, v in enumerate(pyr)]
        out = jnp.concatenate(outs, axis=-1)
        return c + 1e-6 * jnp.mean(out.astype(jnp.float32))
    timeit("corr lookup 4-lvl [dense bf16 out]", dense, coords, pyr)

    # full lookup -> corr-encoder chain: where the layout-boundary copies
    # live in the real program (lookup output is pixels-in-lanes, the conv
    # stack is channels-in-lanes; the 1x1 encoder matmul can absorb the
    # transpose when fed channel-major)
    w0 = jnp.asarray(rng.normal(size=(196, 128)).astype(np.float32) / 16,
                     jnp.bfloat16)
    b0 = jnp.zeros((128,), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(3, 3, 128, 128)).astype(np.float32) / 32,
                     jnp.bfloat16)

    @jax.jit
    def chain_std(c, pyr, w0, b0, w1):
        outs = [corr_ops._lookup_level_impl(v, c / (2.0 ** l),
                                            corr_ops.RADIUS, "dense",
                                            out_dtype=jnp.bfloat16)
                for l, v in enumerate(pyr)]
        corr = jnp.concatenate(outs, axis=-1).reshape(E, H8, W8, 196)
        c0 = jax.nn.relu(jnp.einsum("ehwc,cd->ehwd", corr, w0) + b0)
        c1 = jax.nn.relu(nets._conv_nobias(c0, w1))
        return c + 1e-6 * jnp.mean(c1.astype(jnp.float32))
    timeit("lookup+encoder chain [std]", chain_std, coords, pyr, w0, b0, w1)

    @jax.jit
    def chain_cm(c, pyr_cm, w0, b0, w1):
        corr = corr_ops.lookup_pyramid_cm(pyr_cm, c, corr_ops.RADIUS)
        c0 = jax.nn.relu(jnp.einsum("ecp,cd->epd", corr, w0) + b0)
        c1 = jax.nn.relu(nets._conv_nobias(c0.reshape(E, H8, W8, 128), w1))
        return c + 1e-6 * jnp.mean(c1.astype(jnp.float32))
    timeit("lookup+encoder chain [cm]", chain_cm, coords, pyr_cm, w0, b0, w1)

    @jax.jit
    def build_std(f):
        p = corr_ops.build_pyramid(f, f)
        return f + 1e-6 * sum(jnp.mean(v.astype(jnp.float32)) for v in p)
    timeit("volume build+pyramid [std]", build_std, fm)

    @jax.jit
    def build_cm(f):
        p = corr_ops.build_pyramid_cm(f, f)
        return f + 1e-6 * sum(jnp.mean(v.astype(jnp.float32)) for v in p)
    timeit("volume build+pyramid [cm]", build_cm, fm)


def bench_gru():
    rng = np.random.default_rng(1)
    params = nets.init_params(jax.random.PRNGKey(0))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    net = jnp.asarray(rng.normal(size=(E, H8, W8, 128)), jnp.bfloat16)
    inp = jnp.asarray(rng.normal(size=(E, H8, W8, 128)), jnp.bfloat16)
    cor = jnp.asarray(rng.normal(size=(E, H8, W8, 196)), jnp.bfloat16)
    mot = jnp.asarray(rng.normal(size=(E, H8, W8, 4)), jnp.bfloat16)
    ii = jnp.asarray(rng.integers(0, NW, size=E))

    @jax.jit
    def step(net, params, inp, cor, mot, ii):
        net2, delta, weight, eta, upmask = nets.update_module(
            params, net, inp, cor, mot, ii=ii, num_frames=NW + 1)
        keep = (jnp.mean(delta) + jnp.mean(weight) + jnp.mean(eta)
                + jnp.mean(upmask.astype(jnp.float32)))
        return net2 + (1e-6 * keep).astype(net2.dtype)
    timeit("update_module full (agg)", step, net, params, inp, cor, mot, ii)


def bench_reproject():
    rng = np.random.default_rng(2)
    xi = jnp.asarray(0.01 * rng.normal(size=(B, 6)).astype(np.float32))
    poses = se3.exp(xi)
    disps = jnp.asarray(
        1.0 + 0.1 * rng.normal(size=(B, H8, W8)).astype(np.float32))
    intr = jnp.broadcast_to(
        jnp.asarray([320.0 / 8, 320.0 / 8, W8 / 2, H8 / 2]), (B, 4))
    ii = jnp.asarray(rng.integers(0, 30, size=E))
    jj = jnp.asarray(rng.integers(0, 30, size=E))

    @jax.jit
    def step(poses, disps, intr, ii, jj):
        coords, valid, _ = pops.projective_transform(poses, disps, intr,
                                                     ii, jj)
        keep = jnp.mean(coords) + jnp.mean(valid)
        return se3.retr(poses, 1e-8 * keep * jnp.ones((B, 6), jnp.float32))
    timeit("projective_transform (no jac, 48e)", step, poses, disps, intr,
           ii, jj)


def bench_ba(edges=240, precision=None, factored=True):
    if precision:
        os.environ["DROID_BA_PRECISION"] = precision
    rng = np.random.default_rng(3)
    ii_np = np.concatenate([rng.integers(1, 28, size=edges - E),
                            rng.integers(1, 28, size=E)])
    jj_np = np.concatenate([rng.integers(1, 28, size=edges - E),
                            rng.integers(1, 28, size=E)])
    shape, plan = ba_inf.build_plan(ii_np, jj_np, 2, 28, iters=2,
                                    edges=edges, window=NW, rmax=16)
    xi = jnp.asarray(0.003 * rng.normal(size=(B, 6)).astype(np.float32))
    poses = se3.exp(xi)
    disps = jnp.asarray(
        1.0 + 0.1 * rng.normal(size=(B, H8, W8)).astype(np.float32))
    sens = jnp.zeros((B, H8, W8), jnp.float32)
    damp = 1e-4 * jnp.ones((B, H8, W8), jnp.float32)
    intr = jnp.asarray([320.0 / 8, 320.0 / 8, W8 / 2, H8 / 2])
    tgt = jnp.asarray(rng.uniform(4, 36, size=(shape.edges, 2, HW))
                      .astype(np.float32))
    wgt = jnp.ones((shape.edges, 2, HW), jnp.float32)
    plan_dev = jax.tree.map(jnp.asarray, plan)

    @jax.jit
    def step(state, sens, damp, intr, tgt, wgt, plan_dev):
        poses, disps = state
        return ba_inf.ba_iterations(shape, poses, disps, sens, damp, intr,
                                    tgt, wgt, plan_dev, 1e-4, 0.1)
    # NOTE: ba_iterations always linearizes factored=True; the `factored`
    # flag only drives the linearize+blocks sub-benchmark below.
    timeit(f"ba 2GN e{shape.edges} w{NW} r{shape.rmax} "
           f"[{precision or edge_terms.ba_precision()}]",
           step, (poses, disps), sens, damp, intr, tgt, wgt, plan_dev)

    @jax.jit
    def lin(state, intr, tgt, wgt, plan_dev):
        poses, disps = state
        intr_all = jnp.broadcast_to(intr, (B, 4))
        t = edge_terms.linearize(poses, disps, intr_all, tgt, wgt,
                                 plan_dev.ii, plan_dev.jj,
                                 edge_valid=plan_dev.edge_valid,
                                 factored=factored)
        Hii, Hij, Hji, Hjj, vi, vj = edge_terms.pose_blocks(t)
        Ei, Ej, Cz, bz = edge_terms.depth_blocks(t)
        s = 1e-9 * (jnp.mean(Hii) + jnp.mean(Hij) + jnp.mean(Hji)
                    + jnp.mean(Hjj) + jnp.mean(vi) + jnp.mean(vj)
                    + jnp.mean(Ei) + jnp.mean(Ej) + jnp.mean(Cz)
                    + jnp.mean(bz))
        return (se3.retr(poses, s * jnp.ones((B, 6))), disps + 1e-9 * s)
    timeit(f"  linearize+blocks e{shape.edges} factored={factored}",
           lin, (poses, disps), intr, tgt, wgt, plan_dev)
    if precision:
        del os.environ["DROID_BA_PRECISION"]


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--corr", action="store_true")
    ap.add_argument("--corrcm", action="store_true")
    ap.add_argument("--gru", action="store_true")
    ap.add_argument("--ba", action="store_true")
    ap.add_argument("--reproject", action="store_true")
    ap.add_argument("--impls", default="dense,rows,tent,onehot")
    args = ap.parse_args()
    run_all = not (args.corr or args.corrcm or args.gru or args.ba
                   or args.reproject)
    print(f"backend: {jax.default_backend()} {jax.devices()[0].device_kind}",
          flush=True)
    if args.corr or run_all:
        bench_corr(tuple(args.impls.split(",")))
    if args.corrcm or run_all:
        bench_corr_cm()
    if args.gru or run_all:
        bench_gru()
    if args.reproject or run_all:
        bench_reproject()
    if args.ba or run_all:
        bench_ba(factored=False)
        bench_ba(factored=True)
        bench_ba(precision="high", factored=True)
