"""Edge-parallel frontend update on the virtual 8-device CPU mesh vs the
serial update core (parallel/frontend.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from droid_slam_tpu.models import nets
from droid_slam_tpu.ops import corr as corr_ops
from droid_slam_tpu.state import graph as graph_mod
from droid_slam_tpu.parallel import frontend as pf
from droid_slam_tpu.ba import inference as ba_inference


def _scenario(rng, EB=8, h=16, w=24, NWF=5, cm=False):
    hw = h * w
    f = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    fm1 = (f(EB, h, w, 128) / 8).astype(jnp.bfloat16)
    fm2 = (f(EB, h, w, 128) / 8).astype(jnp.bfloat16)
    build = corr_ops.build_pyramid_cm if cm else corr_ops.build_pyramid
    pyr = tuple(p.astype(jnp.bfloat16) for p in build(fm1, fm2))
    poses = jnp.tile(jnp.asarray([0, 0, 0, 0, 0, 0, 1.0], jnp.float32),
                     (NWF + 1, 1))
    disps = jnp.abs(f(NWF + 1, h, w)) + 0.5
    intr = jnp.broadcast_to(jnp.asarray([60., 60., w / 2, h / 2]),
                            (NWF + 1, 4))
    inps = f(NWF + 1, h, w, 128).astype(jnp.bfloat16)
    nets_e = f(EB, h, w, 128).astype(jnp.bfloat16)
    target = f(EB, 2, hw)
    weight = jnp.abs(f(EB, 2, hw))
    ii = jnp.asarray(rng.integers(0, NWF, EB))
    jj = jnp.asarray(rng.integers(0, NWF, EB))
    valid = jnp.ones(EB, bool)
    return (poses, disps, intr, inps, pyr, nets_e, target, weight, ii, jj,
            valid)


@pytest.mark.parametrize("impl,cm", [("gather", False), ("dense_cm", True)])
def test_edge_parallel_update_matches_serial(rng, impl, cm):
    params = nets.init_params(jax.random.PRNGKey(0))
    NWF = 5
    (poses, disps, intr, inps, pyr, nets_e, target, weight, ii, jj,
     valid) = _scenario(rng, cm=cm, NWF=NWF)
    EB = int(ii.shape[0])

    core = jax.jit(graph_mod._update_core_traced,
                   static_argnames=("nw", "lookup_impl", "slot_native"))
    ref = core(params, poses, disps, intr, inps, pyr, nets_e, target, weight,
               jnp.arange(EB), ii, jj, valid, jnp.asarray(0), NWF, impl,
               slot_native=True)

    mesh = pf.edge_parallel_mesh(8)
    sh = lambda t: pf.shard_edges(mesh, t)
    out = edge = edge = pf.edge_parallel_update(
        mesh, params, poses, disps, intr, inps, sh(pyr), sh(nets_e),
        sh(target), sh(weight), sh(ii), sh(jj), sh(valid), jnp.asarray(0),
        nw=NWF, lookup_impl=impl, compute_upmask=True)

    # per-edge math is identical, but the CPU backend's conv accumulation
    # order differs between batch 1 (one edge/shard) and batch 8, so bf16
    # tensors can differ by one ulp; coords are f32 geometry (exact).
    tol = {"net": 3e-2, "target": 0.25, "weight": 3e-2, "eta": 3e-2,
           "upmask": 3e-2, "coords": 1e-4}
    names = ["net", "target", "weight", "eta", "upmask", "coords"]
    for a, b, nm in zip(ref, out, names):
        a = np.asarray(jnp.asarray(a, jnp.float32))
        b = np.asarray(jnp.asarray(b, jnp.float32))
        np.testing.assert_allclose(a, b, atol=tol[nm], rtol=0, err_msg=nm)
        assert np.abs(a - b).mean() < tol[nm] / 10, nm


def test_edge_parallel_iteration_runs(rng):
    """Sharded update + replicated BA: one full frontend iteration on the
    8-device mesh, finite outputs, poses/disps actually move."""
    params = nets.init_params(jax.random.PRNGKey(0))
    NWF = 5
    (poses, disps, intr, inps, pyr, nets_e, target, weight, ii, jj,
     valid) = _scenario(rng, NWF=NWF)
    B, h, w = disps.shape
    damping = 0.1 * jnp.ones((B, h, w), jnp.float32)
    disps_sens = jnp.zeros((B, h, w), jnp.float32)

    shape, plan = ba_inference.build_plan(
        np.asarray(ii), np.asarray(jj), 1, NWF, iters=2,
        edges=int(ii.shape[0]))
    mesh = pf.edge_parallel_mesh(8)
    sh = lambda t: pf.shard_edges(mesh, t)

    poses2, disps2, damping2, net2, tgt2, wgt2 = pf.edge_parallel_iteration(
        mesh, params, poses, disps, disps_sens, damping, intr, inps,
        sh(pyr), sh(nets_e), sh(target), sh(weight), sh(ii), sh(jj),
        sh(valid), jnp.asarray(0), plan, shape, jnp.asarray(1e-4),
        jnp.asarray(0.1), nw=NWF, lookup_impl="gather")

    for x, nm in [(poses2, "poses"), (disps2, "disps"), (tgt2, "target"),
                  (wgt2, "weight")]:
        assert np.isfinite(np.asarray(jnp.asarray(x, jnp.float32))).all(), nm
    assert not np.allclose(np.asarray(poses2), np.asarray(poses))
