"""Chunk-parallel global BA (update_lowmem) over a device mesh.

The global-BA step (state/graph.py::_fused_lowmem_step, reference
factor_graph.py:267-330) is a sweep of per-chunk GRU updates followed by
one dense BA. Within a sweep the chunks are mutually independent: each
8-source-frame chunk owns a disjoint edge set (its slots) and a disjoint
damping window [g0, g0+8). That makes the sweep embarrassingly parallel
over the CHUNK dimension — the multi-chip answer to the single-chip
memory wall (the per-edge GRU state is ~5 GB at t=1000/240x320,
BENCH_NOTES R7c §3): each chip holds NC/n chunks' worth of edge state.

Layout:
  * per-chunk-packed edge state nets/target/weight [NC, CE, ...] and chunk
    tables [NC, CE] — sharded on the chunk axis;
  * poses/disps/damping/intrinsics/context/fmap pyramid — replicated
    (poses/disps are [B,7]/[B,h,w]; fpyr is the big replicated item, the
    shared read-only feature pyramid);
  * damping updates combine by psum of per-shard deltas (windows are
    disjoint, so the sum IS the update);
  * the dense BA is replicated from all-gathered target/weight
    ([NC,CE,2,hw] ≈ 2*E*hw*4 B per step — e.g. 150 MB at t=1000, once
    per BA step, vs the full sweep's compute per chip).

Used by state/graph.py::_update_lowmem_fused when the FactorGraph carries
a mesh (DroidConfig(edge_parallel=N)), and exercised on the virtual
8-device mesh by __graft_entry__.dryrun_multichip with float-tolerance
equality vs the serial sweep.

Reference scope: /root/reference/droid_slam/droid_backend.py:9-88 runs
this entire workload on one 24 GB GPU; there is no multi-GPU global BA in
the reference to mirror, so the decomposition here is TPU-native design.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def shard_chunks(mesh: Mesh, tree, axis: str = "edges"):
    """Place chunk-packed arrays (leading NC dim) sharded on the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding),
                        tree)


@partial(jax.jit,
         static_argnames=("mesh", "axis", "ba_shape"),
         donate_argnames=("poses", "disps", "nets_c", "target_c",
                          "weight_c", "damping"))
def lowmem_step_mesh(mesh: Mesh, axis: str, params, poses, disps,
                     disps_sens, damping, intrinsics, inps_buf, fpyr,
                     nets_c, target_c, weight_c,
                     c_ii, c_jj, c_iirows, c_jjrows, c_valid, c_g0,
                     target_inac_buf, weight_inac_buf, inac_slots,
                     ba_shape, ba_plan, lm, ep):
    """One global-BA step (chunk sweep + dense BA) with the chunk dim
    sharded over ``mesh``. State contract:

      nets_c [NC,CE,h,w,128], target_c/weight_c [NC,CE,2,hw] chunk-packed
      (row [k, j] = edge j of chunk k), sharded; chunk tables [NC,CE] and
      c_g0 [NC] sharded; everything else replicated. NC must be divisible
      by the mesh size. Returns the updated (poses, disps, damping,
      nets_c, target_c, weight_c) with the same shardings.
    """
    from ..state.graph import _lowmem_chunk_core_traced
    from ..ba import inference as ba_inference

    n = mesh.devices.size
    NC, CE = c_ii.shape
    assert NC % n == 0, f"chunk count {NC} not divisible by mesh size {n}"
    B = damping.shape[0]

    e = P(axis)
    r = P()

    def body(params, poses, disps, disps_sens, damping, intrinsics,
             inps_buf, fpyr, nets_c, target_c, weight_c,
             c_ii, c_jj, c_iirows, c_jjrows, c_valid, c_g0,
             target_inac_buf, weight_inac_buf, inac_slots, ba_plan, lm, ep):
        h, w = disps.shape[-2:]
        hw = h * w

        def one_chunk(nets_k, tgt_k, wgt_k, ii, jj, iir, jjr, valid, g0c):
            # per-chunk packed rows: slots are the local arange
            net_e, tgt_e, wgt_e, eta, _upm = _lowmem_chunk_core_traced(
                params, poses, disps, intrinsics, inps_buf, fpyr,
                nets_k, tgt_k, jnp.arange(CE),
                ii, jj, iir, jjr, valid, g0c, 8)
            vm = valid[:, None, None, None]
            net_k = jnp.where(vm, net_e.astype(nets_k.dtype), nets_k)
            tgt_k = jnp.where(vm[..., 0], tgt_e, tgt_k)
            wgt_k = jnp.where(vm[..., 0], wgt_e, wgt_k)
            present = jax.ops.segment_sum(
                valid.astype(jnp.float32),
                jnp.clip(ii - g0c, 0, 7), num_segments=8) > 0
            return net_k, tgt_k, wgt_k, eta, present

        nets_c, target_c, weight_c, eta_c, present_c = jax.vmap(one_chunk)(
            nets_c, target_c, weight_c, c_ii, c_jj, c_iirows, c_jjrows,
            c_valid, c_g0)

        # damping: disjoint windows -> scatter-add local deltas, psum
        win_all = (c_g0[:, None] + jnp.arange(8)[None, :]).reshape(-1)
        win_all = jnp.clip(win_all, 0, B - 1)
        pm = present_c.reshape(-1)
        upd = jnp.zeros_like(damping).at[win_all].add(
            eta_c.reshape(-1, h, w) * pm[:, None, None])
        msk = jnp.zeros((B,), jnp.float32).at[win_all].add(
            pm.astype(jnp.float32))
        upd = jax.lax.psum(upd, axis)
        msk = jax.lax.psum(msk, axis) > 0
        damping = jnp.where(msk[:, None, None], upd, damping)

        # replicated dense BA from all-gathered packed target/weight
        tgt_all = jax.lax.all_gather(target_c, axis, axis=0, tiled=True)
        wgt_all = jax.lax.all_gather(weight_c, axis, axis=0, tiled=True)
        tgt_ba = jnp.concatenate(
            [target_inac_buf[inac_slots], tgt_all.reshape(-1, 2, hw)],
            axis=0)
        wgt_ba = jnp.concatenate(
            [weight_inac_buf[inac_slots], wgt_all.reshape(-1, 2, hw)],
            axis=0)
        poses, disps = ba_inference.ba_iterations(
            ba_shape, poses, disps, disps_sens, damping, intrinsics[0],
            tgt_ba[:ba_shape.edges], wgt_ba[:ba_shape.edges], ba_plan,
            lm, ep)
        return poses, disps, damping, nets_c, target_c, weight_c

    rep = lambda t: jax.tree.map(lambda _: r, t)
    in_specs = (rep(params), r, r, r, r, r, r, rep(fpyr),
                e, e, e, e, e, e, e, e, e, r, r, r, rep(ba_plan), r, r)
    out_specs = (r, r, r, e, e, e)
    fn = shard_map(body, mesh=mesh, in_specs=in_specs,
                   out_specs=out_specs, check_rep=False)
    return fn(params, poses, disps, disps_sens, damping, intrinsics,
              inps_buf, fpyr, nets_c, target_c, weight_c,
              c_ii, c_jj, c_iirows, c_jjrows, c_valid, c_g0,
              target_inac_buf, weight_inac_buf, inac_slots, ba_plan,
              lm, ep)
