"""Per-edge Gauss-Newton linearization terms for dense bundle adjustment.

One implementation of the math that the reference splits between the CUDA
projective_transform_kernel (/root/reference/src/droid_kernels.cu:185-433,
inference) and the pure-PyTorch assembly (/root/reference/droid_slam/geom/ba.py:38-67,
training). All quantities are edge-major, static-shape, fp32; XLA fuses the
chain (Lie ops -> projection -> Jacobians -> weighting) into a handful of
kernels so nothing round-trips to the host (the reference BA crosses
GPU->CPU(Eigen)->GPU every iteration — the main latency cliff we remove).

Layout: HW is flattened to the last (lane) dimension.
  r  [E, 2, HW]    residuals target - proj
  w  [E, 2, HW]    0.001-scaled confidence weights, zeroed behind the camera
  Ji [E, 2, 6, HW] d(proj)/d(left-perturbation of pose i)
  Jj [E, 2, 6, HW] d(proj)/d(left-perturbation of pose j)
  Jz [E, 2, HW]    d(proj)/d(inverse depth of source pixel)
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp

from ..geom import projective as pops


def ba_precision() -> str:
    """Matmul precision for Hessian/Schur assembly. "highest" = 6-pass fp32
    emulation (bitwise closest to the reference's CUDA fp32 accumulation);
    "high" = 3-pass bf16x3 (~fp32 quality at half the MXU passes). The
    default stays "highest"; DROID_BA_PRECISION=high trades ~2x Schur matmul
    throughput for a last-bit accuracy difference."""
    return os.environ.get("DROID_BA_PRECISION", "highest")


class EdgeTerms(NamedTuple):
    r: jnp.ndarray
    w_pose: jnp.ndarray   # weights for pose blocks (zeroed on stereo edges)
    w_depth: jnp.ndarray  # weights for depth blocks (kept on stereo edges)
    Ji: jnp.ndarray       # None in the factored form (derived via Adj)
    Jj: jnp.ndarray
    Jz: jnp.ndarray
    Adj: jnp.ndarray = None  # [E,6,6] Ad(Gij); set when Ji is None


def linearize(poses, disps, intrinsics, target, weight, ii, jj,
              edge_valid=None, min_depth=pops.MIN_DEPTH_BA,
              zero_stereo_pose=True, factored=True) -> EdgeTerms:
    """Linearize the reprojection residuals of every edge.

    target/weight: [E, 2, HW]. ii/jj: [E] frame indices into poses/disps.
    edge_valid: optional [E] bool mask for padded edge slots.

    Weight semantics follow droid_kernels.cu:311-385: weights are scaled by
    0.001 and zeroed where the transformed depth is behind min_depth; on
    stereo edges (ii == jj) the pose-block weights are zeroed but the
    depth-block weights are kept (zero_stereo_pose=True, the inference
    behavior; the training BA of geom/ba.py:43 keeps them).

    ``factored`` (default): exploit Ji = -Jj @ Ad(Gij) — Ad is constant over
    pixels, so i-side Gauss-Newton blocks are per-edge 6x6 congruences of the
    j-side contractions (pose_blocks/depth_blocks below). This skips the
    [E,HW,2,6] Ji materialization + per-pixel adjT (~30 MB HBM and one of the
    three big pixel contractions per GN iteration); the result is
    algebraically identical to the reference's per-pixel accumulation
    (droid_kernels.cu:337-351) up to f32 reassociation.
    """
    E = ii.shape[0]
    h, w_ = disps.shape[-2:]
    hw = h * w_

    coords, valid, (Ji, Jj, Jz) = pops.projective_transform(
        poses, disps, intrinsics, ii, jj, jacobian=True, min_depth=min_depth,
        factored_jac=factored)
    Adj = None
    if factored:
        from ..lie import se3
        Adj = se3.adj_matrix(pops.relative_poses(poses, ii, jj))

    # [E,H,W,c...] -> [E,c...,HW]
    coords = coords.reshape(E, hw, 2).transpose(0, 2, 1)
    valid = valid.reshape(E, 1, hw)

    r = target - coords
    wgt = 0.001 * weight * valid
    if edge_valid is not None:
        wgt = wgt * edge_valid[:, None, None].astype(wgt.dtype)

    if zero_stereo_pose:
        stereo = (ii == jj)[:, None, None].astype(wgt.dtype)
        w_pose = wgt * (1.0 - stereo)
    else:
        w_pose = wgt
    w_depth = wgt

    if Ji is not None:
        Ji = Ji.reshape(E, hw, 2, 6).transpose(0, 2, 3, 1)
    Jj = Jj.reshape(E, hw, 2, 6).transpose(0, 2, 3, 1)
    Jz = Jz.reshape(E, hw, 2).transpose(0, 2, 1)

    return EdgeTerms(r=r, w_pose=w_pose, w_depth=w_depth, Ji=Ji, Jj=Jj,
                     Jz=Jz, Adj=Adj)


def pose_blocks(t: EdgeTerms, precision: str = None):
    """Dense per-edge pose Hessian blocks and RHS
    (droid_kernels.cu:337-351, geom/ba.py:53-59).

    Returns Hii, Hij, Hji, Hjj [E,6,6] and vi, vj [E,6].

    Factored form (t.Ji is None): with A = Ad(Gij) and Ji = -Jj A,
      Hii = A^T Hjj A,  Hij = -A^T Hjj,  Hji = -Hjj A,  vi = -A^T vj —
    one big pixel contraction instead of three, the rest per-edge 6x6.
    """
    prec = precision or ba_precision()

    Hjj = jnp.einsum("ech,ecdh,ecfh->edf", t.w_pose, t.Jj, t.Jj,
                     precision=prec)
    vj = jnp.einsum("ech,ecdh,ech->ed", t.w_pose, t.Jj, t.r,
                    precision=prec)
    if t.Ji is None:
        A = t.Adj
        # per-edge 6x6 transforms as broadcast-multiply-reduce: einsum would
        # lower these to MXU batched 6x6 matmuls (one 8x128-padded pass per
        # edge — sub-1% utilization); the VPU form fuses flat
        HjjA = (Hjj[:, :, :, None] * A[:, None, :, :]).sum(2)   # Hjj @ A
        Hii = (A[:, :, :, None] * HjjA[:, :, None, :]).sum(1)   # A^T Hjj A
        Hij = -(A[:, :, :, None] * Hjj[:, :, None, :]).sum(1)   # -A^T Hjj
        Hji = -HjjA
        vi = -(A * vj[:, :, None]).sum(1)                       # -A^T vj
        return Hii, Hij, Hji, Hjj, vi, vj

    def H(Ja, Jb):
        return jnp.einsum("ech,ecdh,ecfh->edf", t.w_pose, Ja, Jb,
                          precision=prec)

    Hii = H(t.Ji, t.Ji)
    Hij = H(t.Ji, t.Jj)
    Hji = jnp.swapaxes(Hij, -1, -2)
    vi = jnp.einsum("ech,ecdh,ech->ed", t.w_pose, t.Ji, t.r,
                    precision=prec)
    return Hii, Hij, Hji, Hjj, vi, vj


def depth_blocks(t: EdgeTerms, precision: str = None):
    """Per-edge depth-coupled terms (droid_kernels.cu:328-384).

    Ei/Ej [E,6,HW] pose-depth coupling (pose-weighted), Cz [E,HW] depth diag,
    bz [E,HW] depth RHS (depth-weighted). Factored form: Ei = -Ad^T Ej.
    """
    prec = precision or ba_precision()
    Ej = jnp.einsum("ech,ecdh,ech->edh", t.w_pose, t.Jj, t.Jz)
    if t.Ji is None:
        # true [E,6,6]@[E,6,HW] batched matmul: without an explicit precision
        # the TPU default drops f32 inputs to bf16 passes in the pose-depth
        # coupling, breaking the "exact up to f32 reassociation" contract
        Ei = -jnp.einsum("eda,edh->eah", t.Adj, Ej, precision=prec)
    else:
        Ei = jnp.einsum("ech,ecdh,ech->edh", t.w_pose, t.Ji, t.Jz)
    Cz = jnp.einsum("ech,ech,ech->eh", t.w_depth, t.Jz, t.Jz)
    bz = jnp.einsum("ech,ech,ech->eh", t.w_depth, t.r, t.Jz)
    return Ei, Ej, Cz, bz
