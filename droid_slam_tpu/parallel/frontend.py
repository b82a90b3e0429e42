"""Edge-parallel (tensor-parallel) frontend update over a device mesh.

The single-chip roofline (ROOFLINE.md) puts this framework's tracking loop
at ~25-30 kf/s on one v5e: the update operator (ConvGRU + encoders + heads
+ corr lookup) is 97% of the frame FLOPs and is embarrassingly parallel
over the edge dimension. This module shards that stage across chips:

  * per-edge state (GRU nets, target/weight, the corr-volume pyramid, edge
    tables) is sharded on the edge axis — each chip owns E/n edges and
    their volumes (which also divides the dominant HBM resident, the
    ~1 GB pyramid, across chips);
  * per-frame state (poses, disps, intrinsics, context features) is
    replicated — it is small ([B,7] poses, [B,h,w] disps);
  * the per-frame damping aggregation (GraphAgg's segment-mean) becomes a
    local segment-sum + psum over ICI (models/nets.py::graph_agg);
  * the per-edge outputs the (tiny, replicated) bundle adjustment needs —
    target/weight [E,2,HW] — are all-gathered: ~2.4 MB per iteration at
    the bench shapes, ~10 us over ICI vs ~10 ms of saved compute per chip.

Dense BA stays replicated: it is ~10% of the frame and its Schur row
groups couple edges across shards (a sharded assembly would psum the
[NW,NW,6,6] system for no measurable win at window sizes <= 64).

The same code runs on a real multi-chip mesh or the virtual CPU mesh used
in tests (tests/test_parallel_frontend.py asserts equivalence with the
serial update core); __graft_entry__.dryrun_multichip exercises it as part
of the driver's multi-chip validation.

Reference scope: this parallelizes the update operator of
/root/reference/droid_slam/droid_net.py:78-143 + factor_graph.py:215-263,
which the reference runs on a single GPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def edge_parallel_mesh(n_devices: int | None = None,
                       axis: str = "edges") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_edges(mesh: Mesh, tree, axis: str = "edges"):
    """Place per-edge arrays (leading edge/slot dim) sharded on the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def edge_parallel_update(mesh: Mesh, params, poses, disps, intrinsics,
                         inps_buf, pyramid, nets_e, target, weight,
                         ii, jj, valid, g0, nw: int,
                         lookup_impl: str = "gather",
                         compute_upmask: bool = True,
                         axis: str = "edges"):
    """One GRU+heads iteration with the edge dimension sharded over `mesh`.

    Same in/out contract as state.graph._update_core_traced with
    slot_native=True, except:
      * nets_e/target/weight/pyramid/ii/jj/valid are edge-sharded (their
        leading dim must be divisible by the mesh size);
      * the returned net stays edge-sharded (it is only consumed by the
        next sharded iteration); target/weight/coords come back replicated
        (all-gathered) for the replicated BA; eta/upmask are replicated
        (psum'd segment means).
    """
    from ..state.graph import _update_core_traced

    n = mesh.devices.size
    EB = ii.shape[0]
    assert EB % n == 0, f"edge bucket {EB} not divisible by mesh size {n}"

    e = P(axis)     # edge-sharded
    r = P()         # replicated

    def body(params, poses, disps, intrinsics, inps_buf, pyramid,
             nets_e, target, weight, ii, jj, valid, g0):
        eloc = ii.shape[0]
        net, tgt, wgt, eta, upmask, coords1 = _update_core_traced(
            params, poses, disps, intrinsics, inps_buf, pyramid,
            nets_e, target, weight, jnp.arange(eloc), ii, jj, valid, g0,
            nw=nw, lookup_impl=lookup_impl, slot_native=True,
            compute_upmask=compute_upmask, psum_axis=axis)
        # replicate the small per-edge outputs the replicated BA consumes
        tgt = jax.lax.all_gather(tgt, axis, axis=0, tiled=True)
        wgt = jax.lax.all_gather(wgt, axis, axis=0, tiled=True)
        coords1 = jax.lax.all_gather(coords1, axis, axis=0, tiled=True)
        return net, tgt, wgt, eta, upmask, coords1

    in_specs = (
        jax.tree.map(lambda _: r, params),
        r, r, r, r,                      # poses disps intrinsics inps_buf
        jax.tree.map(lambda _: e, tuple(pyramid)),
        e, e, e, e, e, e,                # nets_e target weight ii jj valid
        r,                               # g0
    )
    out_specs = (e, r, r, r, r if compute_upmask else r, r)
    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
    return fn(params, poses, disps, intrinsics, inps_buf, tuple(pyramid),
              nets_e, target, weight, ii, jj, valid, g0)


@partial(jax.jit,
         static_argnames=("nw", "lookup_impl", "ba_shape", "mesh", "axis"))
def edge_parallel_iteration(mesh: Mesh, params, poses, disps, disps_sens,
                            damping, intrinsics, inps_buf, pyramid, nets_e,
                            target, weight, ii, jj, valid, g0, plan,
                            ba_shape, lm, ep, nw: int,
                            lookup_impl: str = "gather",
                            axis: str = "edges"):
    """Sharded update + replicated windowed BA (one frontend iteration,
    factor_graph.py:215-263 semantics at the edge-parallel layout)."""
    from ..ba import inference as ba_inference

    net, tgt, wgt, eta, upmask, _ = edge_parallel_update(
        mesh, params, poses, disps, intrinsics, inps_buf, pyramid, nets_e,
        target, weight, ii, jj, valid, g0, nw=nw, lookup_impl=lookup_impl,
        compute_upmask=False, axis=axis)
    damping = damping.at[g0 + jnp.arange(nw)].set(
        eta.reshape(nw, *damping.shape[1:]))
    tgt_ba = tgt.reshape(tgt.shape[0], 2, -1)
    wgt_ba = wgt.reshape(wgt.shape[0], 2, -1)
    poses, disps = ba_inference.ba_iterations(
        ba_shape, poses, disps, disps_sens, damping, intrinsics[0],
        tgt_ba[:ba_shape.edges], wgt_ba[:ba_shape.edges], plan, lm, ep)
    return poses, disps, damping, net, tgt, wgt


# ---------------------------------------------------------------------------
# The full fused frontend update, edge-parallel (DroidConfig.edge_parallel)
# ---------------------------------------------------------------------------

@partial(jax.jit,
         static_argnames=("mesh", "axis", "nw", "ea", "lookup_impl",
                          "ba_shape", "upsample"))
def fused_update_mesh(mesh, axis, params, poses, disps, disps_sens, damping,
                      intrinsics, inps_buf, pyramid, nets_e, target, weight,
                      target_inac_buf, weight_inac_buf, packed,
                      nw: int, ea: int, lookup_impl: str, ba_shape, lm, ep,
                      n_iters, upsample: bool, kf_beta, do_next_state,
                      motion_damping, n_iters2, kf_thresh):
    """state.graph._fused_update with the edge/slot dimension sharded over
    ``mesh``: the whole frame program (sensor overwrite, N x (GRU update +
    DBA), keyframe probe, conditional refinement, motion model) runs inside
    ONE shard_map — per-edge compute local, per-frame aggregations psum'd,
    the dense BA replicated from all-gathered target/weight (see
    _make_iteration's edge_axis contract). Bit-compatible with the serial
    program up to reduction reassociation.

    Reference scope: parallelizes droid_net.py:78-143 + factor_graph.py:
    215-263, which the reference runs on one GPU."""
    from ..state import graph as graph_mod

    n = mesh.devices.size
    EB = nets_e.shape[0]
    assert EB % n == 0, f"slot capacity {EB} not divisible by mesh size {n}"

    e = P(axis)
    r = P()

    def body(params, poses, disps, disps_sens, damping, intrinsics,
             inps_buf, pyramid, nets_e, target, weight, tgt_inac, wgt_inac,
             packed, lm, ep, n_iters, kf_beta, do_next_state,
             motion_damping, n_iters2, kf_thresh):
        return graph_mod._fused_update_traced(
            params, poses, disps, disps_sens, damping, intrinsics, inps_buf,
            pyramid, nets_e, target, weight, tgt_inac, wgt_inac, packed,
            nw, ea, lookup_impl, ba_shape, lm, ep, n_iters, upsample,
            kf_beta, do_next_state, motion_damping, n_iters2, kf_thresh,
            edge_axis=axis)

    in_specs = (
        jax.tree.map(lambda _: r, params),
        r, r, r, r, r, r,                # poses disps sens damping intr inps
        jax.tree.map(lambda _: e, tuple(pyramid)),
        e, e, e,                         # nets_e target weight
        r, r, r,                         # inac bufs, packed
        r, r, r, r, r, r, r, r,          # scalars
    )
    # outputs: (poses, disps, damping, nets_e, target, weight, eta_last,
    #           upmask_last, disps_up-or-None, kf_dist)
    out_specs = (r, r, r, e, e, e, r, r, r, r)
    fn = shard_map(body, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
    return fn(params, poses, disps, disps_sens, damping, intrinsics,
              inps_buf, tuple(pyramid), nets_e, target, weight,
              target_inac_buf, weight_inac_buf, packed, lm, ep, n_iters,
              kf_beta, do_next_state, motion_damping, n_iters2, kf_thresh)
