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


def sample_loss(params, images, Ps, disps_gt, intrinsics, ii, jj, cfg,
                num_steps):
    """One training sample (train.py:80-114). Ps are w2c GT poses [N,7];
    images [N,H,W,3] uint8; disps_gt [N,H,W] full-res inverse depth."""
    N = images.shape[0]
    # init: first pose at GT, rest at frame-1's pose (train.py:95-97)
    Gs0 = jnp.concatenate([Ps[:1], jnp.broadcast_to(Ps[1:2], (N - 1, 7))], 0)
    disps0 = jnp.ones_like(disps_gt[:, 3::8, 3::8])
    intr8 = intrinsics / 8.0

    Gs_list, disp_list, residual_list = droidnet.forward(
        params, images, Gs0, disps0, intr8, ii, jj, num_steps=num_steps,
        fixedp=2)

    geo, geo_m = losses.geodesic_loss(Ps, Gs_list, ii, jj, do_scale=False)
    res, res_m = losses.residual_loss(residual_list)
    flo, flo_m = losses.flow_loss(Ps, disps_gt, Gs_list, disp_list,
                                  intrinsics, )
    loss = cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo
    metrics = {**geo_m, **res_m, **flo_m, "loss": loss}
    return loss, metrics


def make_train_step(mesh, cfg: TrainConfig, num_steps: Optional[int] = None,
                    axis: str = "dp"):
    """Build the jitted data-parallel train step. The batch is sharded on
    `axis`; params/opt state are replicated; gradients are psum-averaged."""
    tx = make_optimizer(cfg)
    num_steps = num_steps or cfg.iters

    def local_loss(params, batch):
        def one(images, Ps, disps, intrinsics):
            return sample_loss(params, images, Ps, disps, intrinsics,
                               batch["ii"], batch["jj"], cfg, num_steps)
        lv, mv = jax.vmap(one)(batch["images"], batch["poses"],
                               batch["disps"], batch["intrinsics"])
        return jnp.mean(lv), jax.tree.map(jnp.mean, mv)

    def step(params, opt_state, batch):
        (loss, metrics), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, batch)
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.lax.pmean(metrics, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    pspec_batch = {"images": P(axis), "poses": P(axis), "disps": P(axis),
                   "intrinsics": P(axis), "ii": P(), "jj": P()}
    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), pspec_batch),
        out_specs=(P(), P(), P()),
        check_rep=False)
    return jax.jit(sharded, donate_argnums=(0, 1)), tx


def init_train_state(cfg: TrainConfig, seed: int = 0, params=None):
    if params is None:
        params = nets.init_params(jax.random.PRNGKey(seed))
    tx = make_optimizer(cfg)
    return params, tx.init(params)
