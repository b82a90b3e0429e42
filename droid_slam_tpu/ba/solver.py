"""Damped Cholesky solvers for the BA normal equations (on-device).

The reference solves the pose system on the *CPU* in float64 via Eigen
SimplicialLLT (/root/reference/src/droid_kernels.cu:1201-1222), forcing a
GPU->CPU->GPU round-trip every Gauss-Newton iteration. Here the solve stays on
the TPU: fp32 blocked Cholesky (XLA potrf) plus one step of iterative
refinement, which recovers the accuracy the reference buys with fp64 for these
well-damped systems (verified against float64 in tests/test_ba.py).

Failure semantics follow the reference (geom/chol.py:8-18,
droid_kernels.cu:1216-1219): a failed factorization yields a zero step, not an
exception. XLA's cholesky returns NaNs for indefinite inputs, which we detect.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def damp_diagonal(H: jnp.ndarray, ep: float, lm: float) -> jnp.ndarray:
    """L.diag += ep + lm * L.diag (droid_kernels.cu:1205-1206)."""
    d = jnp.diagonal(H, axis1=-2, axis2=-1)
    return H + jnp.zeros_like(H).at[..., jnp.arange(H.shape[-1]),
                                    jnp.arange(H.shape[-1])].set(ep + lm * d)


def solve_psd(H: jnp.ndarray, b: jnp.ndarray, refine_steps: int = 1) -> jnp.ndarray:
    """Solve H x = b for symmetric positive definite H [..., n, n], b [..., n].

    fp32 Cholesky with `refine_steps` rounds of iterative refinement; returns
    zeros when the factorization fails (reference parity).
    """
    eye = jnp.broadcast_to(jnp.eye(H.shape[-1], dtype=H.dtype), H.shape)
    # Probe the factorization OUTSIDE the gradient graph: XLA's potrf emits
    # NaNs for indefinite input, and a NaN *primal* poisons cholesky's VJP
    # even when the forward value is masked away (0 * NaN = NaN) — the
    # training step's gradients would silently turn NaN the first time one
    # GN system goes indefinite. Re-factorize a sanitized matrix for the
    # differentiable path instead (potrf here is tiny next to the Schur
    # products, so the second factorization is noise).
    L_probe = jsl.cholesky(jax.lax.stop_gradient(H), lower=True)
    ok = jnp.all(jnp.isfinite(L_probe), axis=(-2, -1), keepdims=True)
    L_safe = jsl.cholesky(jnp.where(ok, H, eye), lower=True)

    def chosolve(rhs):
        return jsl.cho_solve((L_safe, True), rhs[..., None])[..., 0]

    x = chosolve(b)
    for _ in range(refine_steps):
        # r = b - H x computed in fp32; correction solve re-uses the factor
        r = b - jnp.einsum("...ij,...j->...i", H, x, precision="highest")
        x = x + chosolve(r)

    return jnp.where(ok[..., 0], x, jnp.zeros_like(x))
