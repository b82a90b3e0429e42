"""DroidNet training forward: the unrolled update-operator + differentiable
BA loop (parity with /root/reference/droid_slam/droid_net.py:172-222).

Single-sample, fully jittable; the trainer vmaps over the batch. Each step:
stop-gradient the state (the reference detaches, droid_net.py:193-196),
correlation lookup, update module, two differentiable BA steps, reprojection
residuals. Returns the per-step histories the losses consume.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ba import dense
from ..geom import projective as pops
from ..ops import corr as corr_ops
from . import nets


@partial(jax.jit, static_argnames=("num_steps", "fixedp", "compute_dtype"))
def forward(params, images, Gs0, disps0, intrinsics, ii, jj,
            num_steps: int = 12, fixedp: int = 2,
            compute_dtype=jnp.bfloat16):
    """images [N,H,W,3] uint8 BGR; Gs0 [N,7]; disps0 [N,h,w];
    intrinsics [N,4] (1/8 scale); ii/jj edge lists.

    compute_dtype: network compute precision (bf16 for TPU training; the
    cross-implementation golden test passes float32 to compare against the
    reference's CPU fp32 forward).

    Returns (Gs_list, disp_up_list, residual_list) with
    disp_up at full resolution via convex upsampling.
    """
    N = images.shape[0]
    E = ii.shape[0]
    h, w = disps0.shape[-2:]
    hw = h * w

    fmaps, net_f, inp_f = nets.extract_features(params, images,
                                                compute_dtype=compute_dtype)
    net = net_f[ii]
    inp = inp_f[ii]
    pyramid = corr_ops.build_pyramid(fmaps[ii].astype(jnp.float32),
                                     fmaps[jj].astype(jnp.float32))

    coords0 = pops.coords_grid(h, w)
    coords1, _, _ = pops.projective_transform(Gs0, disps0, intrinsics, ii, jj)
    target = coords1

    Gs, disps = Gs0, disps0
    Gs_list, disp_list, residual_list = [], [], []
    for _ in range(num_steps):
        Gs = jax.lax.stop_gradient(Gs)
        disps = jax.lax.stop_gradient(disps)
        coords1 = jax.lax.stop_gradient(coords1)
        target = jax.lax.stop_gradient(target)

        corr = corr_ops.lookup_pyramid(pyramid, coords1)
        motn = jnp.concatenate([coords1 - coords0, target - coords1], axis=-1)
        motn = jnp.clip(motn, -64.0, 64.0)

        net, delta, weight, eta, upmask = nets.update_module(
            params, net, inp, corr.astype(compute_dtype),
            motn.astype(compute_dtype), ii=ii, num_frames=N)

        target = coords1 + delta.astype(jnp.float32)

        tgt_ba = target.reshape(E, hw, 2).transpose(0, 2, 1)
        wgt_ba = weight.astype(jnp.float32).reshape(E, hw, 2).transpose(0, 2, 1)
        for _ in range(2):
            Gs, disps = dense._ba_single(
                tgt_ba, wgt_ba, eta.reshape(N, hw), Gs, disps, intrinsics,
                ii, jj, edge_valid=jnp.ones((E,), bool), fixedp=fixedp,
                ep=0.1, lm=1e-4)

        coords1, valid, _ = pops.projective_transform(Gs, disps, intrinsics,
                                                      ii, jj)
        residual_list.append(valid * (target - coords1))
        Gs_list.append(Gs)
        disp_list.append(nets.upsample_disp(disps, upmask))

    return Gs_list, disp_list, residual_list
