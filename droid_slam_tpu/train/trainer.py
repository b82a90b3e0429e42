"""Data-parallel trainer: the reference's DDP loop re-expressed as
shard_map over a JAX device mesh (replaces /root/reference/train.py:28-142;
NCCL all-reduce becomes a psum over ICI).

One step: scanned DroidNet forward with in-scan loss accumulation (see
sample_loss) on each device's batch shard -> w1*geodesic + w2*residual + w3*flow -> grads psum-averaged ->
global-norm clip 2.5 -> Adam + OneCycle schedule (train.py:68-71,125-127).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ba import dense
from ..geom import projective as pops
from ..lie import se3
from ..models import nets
from ..ops import corr as corr_ops
from . import losses


@dataclasses.dataclass
class TrainConfig:
    lr: float = 2.5e-4
    steps: int = 250_000
    iters: int = 15
    clip: float = 2.5
    n_frames: int = 7
    w1: float = 10.0   # geodesic
    w2: float = 0.01   # residual
    w3: float = 0.05   # flow
    edges: int = 24
    restart_prob: float = 0.2
    weight_decay: float = 1e-5
    pct_start: float = 0.01
    fmin: float = 8.0
    fmax: float = 96.0


def _zero_nonfinite():
    """Zero non-finite gradient entries (NaN AND inf) before the global-norm
    clip — the same philosophy as the reference's GradClip backward, which
    zeroes NaN gradients mid-backprop (modules/clipping.py:13-17), applied at
    the optimizer boundary. A NaN/inf that slips past the per-head clips
    (e.g. through an unclipped path on low-precision hardware) skews one
    step instead of permanently destroying the parameters; an inf surviving
    into `clip_by_global_norm` would itself mint NaNs (inf * 0). The
    `grad_nanfrac` train metric keeps this observable."""
    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        updates = jax.tree.map(
            lambda g: jnp.where(jnp.isfinite(g), g, jnp.zeros_like(g)),
            updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: TrainConfig):
    schedule = optax.linear_onecycle_schedule(
        transition_steps=cfg.steps, peak_value=cfg.lr,
        pct_start=cfg.pct_start, pct_final=1.0, div_factor=25.0,
        final_div_factor=1e4)
    return optax.chain(
        _zero_nonfinite(),
        optax.clip_by_global_norm(cfg.clip),
        optax.add_decayed_weights(cfg.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


def default_init(Ps, disps_gt):
    """Gs0: first pose at GT, rest copy frame 1 (train.py:95-97);
    disps0 = 1 at 1/8 res."""
    N = Ps.shape[0]
    Gs0 = jnp.concatenate([Ps[:1], jnp.broadcast_to(Ps[1:2], (N - 1, 7))], 0)
    disps0 = jnp.ones_like(disps_gt[:, 3::8, 3::8])
    return Gs0, disps0


def sample_loss(params, images, Ps, disps_gt, intrinsics, Gs0, disps0,
                ii, jj, cfg, num_steps, gamma=0.9,
                compute_dtype=jnp.bfloat16):
    """One training sample (train.py:80-114). Ps are w2c GT poses [N,7];
    images [N,H,W,3] uint8; disps_gt [N,H,W] full-res inverse depth.
    Gs0/disps0 are the unroll initialization (GT-anchored on the first pass,
    the detached last estimate on random restarts, train.py:115-117).

    The iteration loop is a `lax.scan` with per-step loss accumulation and
    per-step rematerialization, NOT a Python unroll: the reference's
    unrolled graph (droid_net.py:172-222 + geom/losses.py history lists)
    would compile a ~15x larger XLA program and keep every iteration's
    activations live through the backward pass. Same math as
    `droidnet.forward` + the list-based losses (pinned by
    tests/test_train_step.py::test_sample_loss_matches_unrolled)."""
    intr8 = intrinsics / 8.0
    N = images.shape[0]
    E = ii.shape[0]
    h, w = disps0.shape[-2:]
    hw = h * w
    cdt = compute_dtype

    fmaps, net_f, inp_f = nets.extract_features(params, images,
                                                compute_dtype=cdt)
    net0 = net_f[ii]
    inp = inp_f[ii]
    pyramid = corr_ops.build_pyramid(fmaps[ii].astype(jnp.float32),
                                     fmaps[jj].astype(jnp.float32))
    coords0 = pops.coords_grid(h, w)
    coords1, _, _ = pops.projective_transform(Gs0, disps0, intr8, ii, jj)

    # loss-side constants, hoisted out of the scan
    dP = se3.mul(Ps[jj], se3.inv(Ps[ii]))
    ii_adj, jj_adj = losses.adjacent_pairs(N)
    f_coords0, f_val0 = losses.flow_gt(Ps, disps_gt, intrinsics,
                                       ii_adj, jj_adj)

    def body(carry, wgt):
        net, Gs, disps, coords1, target, _ = carry
        # per-iteration detach (train-time semantics: gradients flow from
        # each iteration's own outputs only, droid_net.py:181-184)
        Gs = jax.lax.stop_gradient(Gs)
        disps = jax.lax.stop_gradient(disps)
        coords1 = jax.lax.stop_gradient(coords1)
        target = jax.lax.stop_gradient(target)

        corr = corr_ops.lookup_pyramid(pyramid, coords1)
        motn = jnp.concatenate([coords1 - coords0, target - coords1],
                               axis=-1)
        motn = jnp.clip(motn, -64.0, 64.0)
        net, delta, weight, eta, upmask = nets.update_module(
            params, net, inp, corr.astype(cdt), motn.astype(cdt),
            ii=ii, num_frames=N)
        target = coords1 + delta.astype(jnp.float32)

        tgt_ba = target.reshape(E, hw, 2).transpose(0, 2, 1)
        wgt_ba = weight.astype(jnp.float32).reshape(E, hw, 2).transpose(
            0, 2, 1)
        for _ in range(2):
            Gs, disps = dense._ba_single(
                tgt_ba, wgt_ba, eta.reshape(N, hw), Gs, disps, intr8,
                ii, jj, edge_valid=jnp.ones((E,), bool), fixedp=2,
                ep=0.1, lm=1e-4)
        coords1, valid, _ = pops.projective_transform(Gs, disps, intr8,
                                                      ii, jj)
        resid = valid * (target - coords1)
        disp_up = nets.upsample_disp(disps, upmask)

        geo_i = losses.geodesic_step(dP, Gs, ii, jj, do_scale=False)
        res_i = jnp.mean(jnp.abs(resid))
        flo_i, _, _ = losses.flow_step(f_coords0, f_val0, Gs, disp_up,
                                       intrinsics, ii_adj, jj_adj)
        carry = (net, Gs, disps, coords1, target, disp_up)
        return carry, (wgt * geo_i, wgt * res_i, wgt * flo_i)

    ws = gamma ** (num_steps - 1.0 - jnp.arange(num_steps,
                                                dtype=jnp.float32))
    disp_up0 = jnp.zeros_like(disps_gt)
    carry0 = (net0, Gs0, disps0, coords1, coords1, disp_up0)
    carry, (geo_t, res_t, flo_t) = jax.lax.scan(
        jax.checkpoint(body), carry0, ws)
    _, Gs_f, _, _, _, disp_up_f = carry

    geo = jnp.sum(geo_t)
    res = jnp.sum(res_t)
    flo = jnp.sum(flo_t)
    loss = cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo
    # final-iterate flow metrics recomputed once post-scan (cheaper than
    # scanning a full-res epe stack out just to keep its last slice)
    _, epe_f, v_f = losses.flow_step(f_coords0, f_val0,
                                     jax.lax.stop_gradient(Gs_f),
                                     jax.lax.stop_gradient(disp_up_f),
                                     intrinsics, ii_adj, jj_adj)
    metrics = {
        **losses.geodesic_metrics(dP, Gs_f, ii, jj, do_scale=False),
        "residual": res,
        **losses.flow_metrics(epe_f, v_f),
        "loss": loss,
    }
    final = (jax.lax.stop_gradient(Gs_f),
             jax.lax.stop_gradient(disp_up_f[:, 3::8, 3::8]))
    return loss, (metrics, final)


def make_train_step(mesh, cfg: TrainConfig, num_steps: Optional[int] = None,
                    axis: str = "dp"):
    """Build the jitted data-parallel train step. The batch is sharded on
    `axis`; params/opt state are replicated; gradients are psum-averaged.

    The step runs the reference's random-restart inner loop
    (train.py:101-117) as a bounded lax.while_loop: gradients accumulate
    across restarts from the detached last estimates, then one clipped Adam
    update is applied.
    """
    tx = make_optimizer(cfg)
    num_steps = num_steps or cfg.iters
    max_restarts = 4

    def local_loss(params, batch, Gs0, disps0):
        def one(images, Ps, disps, intrinsics, g0, d0):
            return sample_loss(params, images, Ps, disps, intrinsics, g0, d0,
                               batch["ii"], batch["jj"], cfg, num_steps)
        lv, (mv, finals) = jax.vmap(one)(
            batch["images"], batch["poses"], batch["disps"],
            batch["intrinsics"], Gs0, disps0)
        return jnp.mean(lv), (jax.tree.map(jnp.mean, mv), finals)

    def step(params, opt_state, batch, restart_key):
        Ps = batch["poses"]
        Gs0, disps0 = jax.vmap(default_init)(Ps, batch["disps"])

        def body(carry):
            key, k, grads, _, g0, d0 = carry
            (_, (metrics, (gN, dN))), g = jax.value_and_grad(
                local_loss, has_aux=True)(params, batch, g0, d0)
            grads = jax.tree.map(jnp.add, grads, g)
            key, sub = jax.random.split(key)
            return (key, k + 1, grads, metrics, gN, dN)

        def cond(carry):
            key, k, *_ = carry
            r = jax.random.uniform(jax.random.fold_in(key, 7))
            # always run once; continue with prob restart_prob (train.py:102)
            return (k == 0) | ((r < cfg.restart_prob) & (k < max_restarts))

        zero_grads = jax.tree.map(jnp.zeros_like, params)
        zero_metrics = {k: jnp.zeros(()) for k in
                        ("rot_error", "tr_error", "bad_rot", "bad_tr",
                         "residual", "f_error", "1px", "loss")}
        carry = (restart_key, jnp.zeros((), jnp.int32), zero_grads,
                 zero_metrics, Gs0, disps0)
        _, _, grads, metrics, _, _ = jax.lax.while_loop(cond, body, carry)

        grads = jax.lax.pmean(grads, axis)
        leaves = jax.tree.leaves(grads)
        n_bad = sum(jnp.sum(~jnp.isfinite(g)) for g in leaves)
        n_tot = sum(g.size for g in leaves)
        metrics["grad_nanfrac"] = n_bad.astype(jnp.float32) / n_tot
        metrics = jax.lax.pmean(metrics, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    pspec_batch = {"images": P(axis), "poses": P(axis), "disps": P(axis),
                   "intrinsics": P(axis), "ii": P(), "jj": P()}
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), pspec_batch, P()),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0, 1)), tx


def init_train_state(cfg: TrainConfig, seed: int = 0, params=None):
    if params is None:
        params = nets.init_params(jax.random.PRNGKey(seed))
    tx = make_optimizer(cfg)
    return params, tx.init(params)
