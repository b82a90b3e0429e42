"""Diagnostic: time the internal stages of the windowed BA on device."""

import time

import numpy as np
import jax
import jax.numpy as jnp

from droid_slam_tpu.ba import edge_terms, inference as ba_inf
from droid_slam_tpu.ba.solver import solve_psd
from droid_slam_tpu.lie import se3


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:34s} {(time.perf_counter() - tic) / n * 1000:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    h, w = 40, 64
    hw = h * w
    B = 64
    E = 96
    NW = 32

    poses = se3.exp(jnp.asarray(0.01 * rng.normal(size=(B, 6))
                                .astype(np.float32)))
    disps = jnp.ones((B, h, w), jnp.float32)
    intr = jnp.broadcast_to(jnp.asarray([320.0, 320.0, w / 2, h / 2]),
                            (B, 4))
    ii = jnp.asarray(rng.integers(1, 30, size=E))
    jj = jnp.asarray(rng.integers(1, 30, size=E))
    target = jnp.asarray(rng.uniform(0, w, size=(E, 2, hw))
                         .astype(np.float32))
    weight = jnp.ones((E, 2, hw), jnp.float32)
    ev = jnp.ones((E,), bool)

    lin = jax.jit(lambda p, d: edge_terms.linearize(
        p, d, intr, target, weight, ii, jj, edge_valid=ev, min_depth=0.25))
    t = timeit("linearize", lin, poses, disps)

    pb = jax.jit(lambda t: edge_terms.pose_blocks(t))
    timeit("pose_blocks", pb, t)
    db = jax.jit(lambda t: edge_terms.depth_blocks(t))
    timeit("depth_blocks", db, t)

    M = jnp.asarray(rng.normal(size=(NW * 6, NW * 6)).astype(np.float32))
    M = M @ M.T + 10.0 * jnp.eye(NW * 6)
    b = jnp.asarray(rng.normal(size=(NW * 6,)).astype(np.float32))
    timeit("solve_psd 192 (refine=1)", jax.jit(solve_psd), M, b)
    timeit("solve_psd 192 (refine=0)",
           jax.jit(lambda M, b: solve_psd(M, b, refine_steps=0)), M, b)
    import jax.scipy.linalg as jsl
    timeit("cholesky 192", jax.jit(lambda M: jsl.cholesky(M, lower=True)), M)

    # full iteration for reference
    sens = jnp.zeros((B, h, w), jnp.float32)
    damp = 1e-6 * jnp.ones((B, h, w), jnp.float32)
    shape, plan = ba_inf.build_plan(np.asarray(ii), np.asarray(jj), 2, 30,
                                    iters=1)
    tgt = jnp.zeros((shape.edges, 2, hw)).at[:E].set(target)
    wgt = jnp.zeros((shape.edges, 2, hw)).at[:E].set(weight)

    def ba1(p, d):
        return ba_inf.ba_windowed(shape, p, d, sens, damp, intr[0], tgt, wgt,
                                  plan, 1e-4, 0.1)
    out = ba1(poses, disps)
    jax.block_until_ready(out)
    tic = time.perf_counter()
    n = 10
    for _ in range(n):
        out = ba1(*out)
    jax.block_until_ready(out)
    print(f"{'ba_windowed 1GN':34s} "
          f"{(time.perf_counter() - tic) / n * 1000:8.2f} ms")


if __name__ == "__main__":
    main()
