"""Data-parallel trainer: the reference's DDP loop re-expressed as
shard_map over a JAX device mesh (replaces /root/reference/train.py:28-142;
NCCL all-reduce becomes a psum over ICI).

One step: unrolled DroidNet forward (models/droidnet.py) on each device's
batch shard -> w1*geodesic + w2*residual + w3*flow -> grads psum-averaged ->
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

from ..lie import se3
from ..models import droidnet, nets
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


def make_optimizer(cfg: TrainConfig):
    schedule = optax.linear_onecycle_schedule(
        transition_steps=cfg.steps, peak_value=cfg.lr,
        pct_start=cfg.pct_start, pct_final=1.0, div_factor=25.0,
        final_div_factor=1e4)
    return optax.chain(
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
                ii, jj, cfg, num_steps):
    """One training sample (train.py:80-114). Ps are w2c GT poses [N,7];
    images [N,H,W,3] uint8; disps_gt [N,H,W] full-res inverse depth.
    Gs0/disps0 are the unroll initialization (GT-anchored on the first pass,
    the detached last estimate on random restarts, train.py:115-117)."""
    intr8 = intrinsics / 8.0

    Gs_list, disp_list, residual_list = droidnet.forward(
        params, images, Gs0, disps0, intr8, ii, jj, num_steps=num_steps,
        fixedp=2)

    geo, geo_m = losses.geodesic_loss(Ps, Gs_list, ii, jj, do_scale=False)
    res, res_m = losses.residual_loss(residual_list)
    flo, flo_m = losses.flow_loss(Ps, disps_gt, Gs_list, disp_list,
                                  intrinsics)
    loss = cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo
    metrics = {**geo_m, **res_m, **flo_m, "loss": loss}
    final = (jax.lax.stop_gradient(Gs_list[-1]),
             jax.lax.stop_gradient(disp_list[-1][:, 3::8, 3::8]))
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
