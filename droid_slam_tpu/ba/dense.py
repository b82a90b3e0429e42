"""Training-time differentiable dense bundle adjustment (batched, pure JAX).

Mirrors the numerics of /root/reference/droid_slam/geom/ba.py (BA, MoBA) and
geom/chol.py: depth variables are eliminated with a dense Schur complement and
the pose system is solved with a damped Cholesky factorization. Differentiable
end-to-end — JAX's cholesky JVP/VJP matches the hand-written backward of the
reference's CholeskySolver (chol.py:21-30).

Static-shape design: the edge list is padded (edge_valid mask) and depth
variables exist for *all* N frames (frames without edges receive zero updates,
which reproduces the reference's kx=unique(ii) behavior exactly) so one
compilation serves every training graph of a given size.

Damping convention (training): the pose Hessian diagonal is damped BEFORE the
Schur complement is subtracted (chol.py:46-57) — note this differs from the
inference kernel, which damps after (droid_kernels.cu:1201-1222);
ba/inference.py reproduces that one.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..lie import se3
from . import edge_terms
from .solver import solve_psd


def _scatter_mat(blocks, ei, ej, P):
    """Sum [E,6,6] blocks into dense [P,P,6,6]; negative indices are dropped
    (safe_scatter_add_mat, geom/ba.py:12-14)."""
    valid = (ei >= 0) & (ej >= 0) & (ei < P) & (ej < P)
    idx = jnp.where(valid, ei * P + ej, P * P)
    out = jax.ops.segment_sum(
        blocks * valid[:, None, None].astype(blocks.dtype), idx,
        num_segments=P * P + 1)
    return out[:-1].reshape(P, P, 6, 6)


def _scatter_vec(vecs, ei, P):
    valid = (ei >= 0) & (ei < P)
    idx = jnp.where(valid, ei, P)
    out = jax.ops.segment_sum(vecs * valid[:, None].astype(vecs.dtype), idx,
                              num_segments=P + 1)
    return out[:-1]


def _ba_single(target, weight, eta, poses, disps, intrinsics, ii, jj,
               edge_valid, fixedp: int, ep: float, lm: float):
    """One GN step on one batch element. target/weight [E,2,HW], eta [N,HW],
    poses [N,7], disps [N,h,w], intrinsics [N,4]."""
    N, h, w = disps.shape
    hw = h * w
    E = ii.shape[0]
    P = N - fixedp

    t = edge_terms.linearize(
        poses, disps, intrinsics, target, weight, ii, jj,
        edge_valid=edge_valid, min_depth=0.2, zero_stereo_pose=False)

    Hii, Hij, Hji, Hjj, vi, vj = edge_terms.pose_blocks(t)
    Ei_e, Ej_e, Cz_e, bz_e = edge_terms.depth_blocks(t)

    ei = ii - fixedp
    ej = jj - fixedp
    H = (_scatter_mat(Hii, ei, ei, P) + _scatter_mat(Hij, ei, ej, P)
         + _scatter_mat(Hji, ej, ei, P) + _scatter_mat(Hjj, ej, ej, P))
    v = _scatter_vec(vi, ei, P) + _scatter_vec(vj, ej, P)

    # pose-depth coupling, dense over all N depth frames [P, N, 6, HW]
    def scatter_E(blocks, ep_, kk):
        valid = (ep_ >= 0) & (ep_ < P)
        idx = jnp.where(valid, ep_ * N + kk, P * N)
        out = jax.ops.segment_sum(
            blocks * valid[:, None, None].astype(blocks.dtype), idx,
            num_segments=P * N + 1)
        return out[:-1].reshape(P, N, 6, hw)

    Emat = scatter_E(Ei_e, ei, ii) + scatter_E(Ej_e, ej, ii)

    C = jax.ops.segment_sum(Cz_e, ii, num_segments=N) + eta + 1e-7
    wz = jax.ops.segment_sum(bz_e, ii, num_segments=N)

    # ---- Schur solve (training damping: before subtraction, chol.py:46-57) --
    Hd = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    Hd = Hd + (ep + lm * Hd) * jnp.eye(P * 6, dtype=Hd.dtype)
    Q = 1.0 / C  # [N,HW]
    Ed = Emat.transpose(0, 2, 1, 3).reshape(P * 6, N * hw)
    EQ = Ed * Q.reshape(-1)
    S = Hd - jnp.einsum("ik,jk->ij", EQ, Ed, precision="highest")
    rhs = v.reshape(-1) - EQ @ wz.reshape(-1)

    dx = solve_psd(S, rhs)
    dz = Q.reshape(-1) * (wz.reshape(-1) - Ed.T @ dx)
    dx = dx.reshape(P, 6)
    dz = dz.reshape(N, h, w)

    # ---- retraction (geom/ba.py:99-104) --------------------------------
    poses = poses.at[fixedp:].set(se3.retr(poses[fixedp:], dx))
    disps = disps + dz
    disps = jnp.where(disps > 10.0, jnp.zeros_like(disps), disps)
    disps = jnp.clip(disps, min=0.0)
    return poses, disps


@partial(jax.jit, static_argnames=("fixedp",))
def bundle_adjust(target, weight, eta, poses, disps, intrinsics, ii, jj,
                  edge_valid=None, fixedp: int = 1, ep: float = 0.1,
                  lm: float = 1e-4):
    """Batched full BA step (geom/ba.py:31-106).

    target/weight: [B,E,2,HW]; eta: [B,N,HW]; poses [B,N,7]; disps [B,N,h,w];
    intrinsics [B,N,4]; ii/jj shared across the batch.
    """
    if edge_valid is None:
        edge_valid = jnp.ones(ii.shape, dtype=bool)
    f = partial(_ba_single, fixedp=fixedp, ep=ep, lm=lm)
    return jax.vmap(f, in_axes=(0, 0, 0, 0, 0, 0, None, None, None))(
        target, weight, eta, poses, disps, intrinsics, ii, jj, edge_valid)


def _moba_single(target, weight, poses, disps, intrinsics, ii, jj, edge_valid,
                 fixedp: int, ep: float, lm: float):
    N = disps.shape[0]
    P = N - fixedp
    t = edge_terms.linearize(
        poses, disps, intrinsics, target, weight, ii, jj,
        edge_valid=edge_valid, min_depth=0.2, zero_stereo_pose=False)
    Hii, Hij, Hji, Hjj, vi, vj = edge_terms.pose_blocks(t)
    ei, ej = ii - fixedp, jj - fixedp
    H = (_scatter_mat(Hii, ei, ei, P) + _scatter_mat(Hij, ei, ej, P)
         + _scatter_mat(Hji, ej, ei, P) + _scatter_mat(Hjj, ej, ej, P))
    v = _scatter_vec(vi, ei, P) + _scatter_vec(vj, ej, P)
    Hd = H.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
    Hd = Hd + (ep + lm * Hd) * jnp.eye(P * 6, dtype=Hd.dtype)
    dx = solve_psd(Hd, v.reshape(-1)).reshape(P, 6)
    poses = poses.at[fixedp:].set(se3.retr(poses[fixedp:], dx))
    return poses


@partial(jax.jit, static_argnames=("fixedp",))
def motion_only(target, weight, poses, disps, intrinsics, ii, jj,
                edge_valid=None, fixedp: int = 1, ep: float = 0.1,
                lm: float = 1e-4):
    """Batched motion-only BA (geom/ba.py:109-157; damping applied to the true
    diagonal rather than every 6x6 block — see note in module docstring)."""
    if edge_valid is None:
        edge_valid = jnp.ones(ii.shape, dtype=bool)
    f = partial(_moba_single, fixedp=fixedp, ep=ep, lm=lm)
    return jax.vmap(f, in_axes=(0, 0, 0, 0, 0, None, None, None))(
        target, weight, poses, disps, intrinsics, ii, jj, edge_valid)
