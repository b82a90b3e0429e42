"""Pure-JAX Sim(3) on quaternions + log-scale.

Storage: 8 floats ``[tx, ty, tz, qx, qy, qz, qw, s]`` (scale stored linearly,
matching lietorch's Sim3 data layout consumed at
/root/reference/droid_slam/geom/losses.py:11 and align.py). Action on points:
``y = s * R(q) x + t``. Tangent is 7-dim ``[tau, phi, sigma]``.

Only the subset the reference pipeline consumes is implemented: construction
from SE3, mul/inv, exp/log, scale, action on homogeneous points, and the
4x7 point-action Jacobian used by projective ops
(/root/reference/droid_slam/geom/projective_ops.py:125-158).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def from_se3(g: jnp.ndarray) -> jnp.ndarray:
    s = jnp.ones_like(g[..., :1])
    return jnp.concatenate([g, s], axis=-1)


def to_se3(g: jnp.ndarray) -> jnp.ndarray:
    return g[..., :7]


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    base = jnp.array([0, 0, 0, 0, 0, 0, 1, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (8,))


def scale(g: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply the scale component (lietorch ``Sim3.scale``); s broadcasts."""
    s = jnp.asarray(s)[..., None] if jnp.ndim(s) < g.ndim else jnp.asarray(s)
    return jnp.concatenate([g[..., :7], g[..., 7:8] * s], axis=-1)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    sa = a[..., 7:8]
    t = sa * se3.quat_rotate(a[..., 3:7], b[..., :3]) + a[..., :3]
    q = se3.quat_mul(a[..., 3:7], b[..., 3:7])
    return jnp.concatenate([t, q, sa * b[..., 7:8]], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    qi = se3.quat_inv(g[..., 3:7])
    si = 1.0 / g[..., 7:8]
    t = -si * se3.quat_rotate(qi, g[..., :3])
    return jnp.concatenate([t, qi, si], axis=-1)


def act(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous action: Y[:3] = s R X[:3] + w t, Y[3] = w."""
    y = g[..., 7:8] * se3.quat_rotate(g[..., 3:7], X[..., :3]) + X[..., 3:4] * g[..., :3]
    return jnp.concatenate([y, X[..., 3:4]], axis=-1)


def _W_coeffs(theta_sq: jnp.ndarray, sigma: jnp.ndarray):
    """Coefficients (A, B, C) of W = A I + B [phi]x + C [phi]x^2 with
    W the Sim3 left-Jacobian-like matrix: t = W tau  (Ethan Eade's notation)."""
    theta = jnp.sqrt(theta_sq)
    s = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta_sq < 1e-8
    safe_sig = jnp.where(small_sig, jnp.ones_like(sigma), sigma)
    safe_th = jnp.where(small_th, jnp.ones_like(theta), theta)
    safe_th_sq = safe_th * safe_th

    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  (s - 1.0) / safe_sig)

    cos_t, sin_t = jnp.cos(safe_th), jnp.sin(safe_th)
    # generic branch (sigma != 0, theta != 0)
    denom = safe_sig * safe_sig + safe_th_sq
    a_gen = (s * sin_t * safe_sig + (1.0 - s * cos_t) * safe_th) / (safe_th * denom)
    b_gen = (C - ((s * cos_t - 1.0) * safe_sig + s * sin_t * safe_th) / denom) / safe_th_sq
    # sigma -> 0 branch
    a_sig0 = (1.0 - cos_t) / safe_th_sq
    b_sig0 = (safe_th - sin_t) / (safe_th * safe_th_sq)
    # theta -> 0 branch
    a_th0 = jnp.where(small_sig, 0.5 + sigma / 6.0,
                      ((safe_sig - 1.0) * s + 1.0) / (safe_sig * safe_sig))
    b_th0 = jnp.where(small_sig, 1.0 / 6.0 + sigma / 24.0,
                      (s * (safe_sig * safe_sig / 2.0 - safe_sig + 1.0) - 1.0)
                      / (safe_sig ** 3))

    A = jnp.where(small_th, a_th0, jnp.where(small_sig, a_sig0, a_gen))
    B = jnp.where(small_th, b_th0, jnp.where(small_sig, b_sig0, b_gen))
    return A, B, C


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Tangent [tau, phi, sigma] -> Sim3."""
    tau, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6:7]
    q = se3.so3_exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    A, B, C = _W_coeffs(theta_sq, sigma)
    phi_x_tau = jnp.cross(phi, tau)
    t = C * tau + A * phi_x_tau + B * jnp.cross(phi, phi_x_tau)
    return jnp.concatenate([t, q, jnp.exp(sigma)], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Sim3 -> tangent [tau, phi, sigma] (inverse of exp, via W^-1 t)."""
    phi = se3.so3_log(g[..., 3:7])
    sigma = jnp.log(g[..., 7:8])
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    A, B, C = _W_coeffs(theta_sq, sigma)
    # Invert W = C I + A K + B K^2 (K = [phi]x, K^3 = -th^2 K) within the
    # commutative algebra spanned by {I, K, K^2}: writing W^-1 = a I + b K + c K^2
    # and matching coefficients of I, K, K^2 gives
    #   C a = 1;   A a + (C - th^2 B) b - th^2 A c = 0;
    #   B a + A b + (C - th^2 B) c = 0
    a = 1.0 / C
    m = C - theta_sq * B
    deno = m * m + theta_sq * A * A
    b = -a * A * C / deno
    c = a * (A * A - B * m) / deno
    t = g[..., :3]
    phi_x_t = jnp.cross(phi, t)
    tau = a * t + b * phi_x_t + c * jnp.cross(phi, phi_x_t)
    return jnp.concatenate([tau, phi, sigma], axis=-1)
