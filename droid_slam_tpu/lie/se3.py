"""Pure-JAX SE(3) on quaternions.

Storage convention matches the reference pipeline (7 floats per pose,
``[tx, ty, tz, qx, qy, qz, qw]`` — see /root/reference/droid_slam/depth_video.py:41
and the device math in /root/reference/src/droid_kernels.cu:67-184). All ops are
elementwise over arbitrary leading batch dims and are differentiable; there is
no native code — XLA fuses these into the surrounding kernels.

Conventions (validated against the reference's device kernels in tests):
  * group element g = (t, q) acts on homogeneous points X = [x, y, z, w] by
    ``Y = R(q) X[:3] + w * t`` with the homogeneous/disparity coord carried
    through (actSE3, src/droid_kernels.cu:79-86).
  * exp/log use the [tau(3), phi(3)] ordering (translation first), matching
    lietorch's SE3.exp and expSE3 (src/droid_kernels.cu:156-184).
  * retr(g, xi) = exp(xi) ∘ g  (left retraction; pose_retr_kernel,
    src/droid_kernels.cu:886-904).
  * adjT(g, a) = Ad(g)^T a    (adjSE3, src/droid_kernels.cu:88-103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def identity(shape=(), dtype=jnp.float32) -> jnp.ndarray:
    """Identity pose(s) with the given leading batch shape."""
    base = jnp.array([0, 0, 0, 0, 0, 0, 1], dtype=dtype)
    return jnp.broadcast_to(base, tuple(shape) + (7,))


# ---------------------------------------------------------------------------
# quaternion primitives ([x, y, z, w] layout)
# ---------------------------------------------------------------------------

def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 ⊗ q2 (rotation composition R(q1)R(q2))."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_inv(q: jnp.ndarray) -> jnp.ndarray:
    """Conjugate (== inverse for unit quaternions)."""
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vectors by unit quaternions: R(q) v.

    Uses the two-cross-product form of actSO3 (src/droid_kernels.cu:67-77):
    v + w*(2 qv×v) + qv×(2 qv×v).
    """
    qv = q[..., :3]
    w = q[..., 3:4]
    uv = 2.0 * jnp.cross(qv, v)
    return v + w * uv + jnp.cross(qv, uv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> 3x3 rotation matrix."""
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


# ---------------------------------------------------------------------------
# group ops
# ---------------------------------------------------------------------------

def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose: (a ∘ b)(X) = a(b(X))."""
    t = quat_rotate(a[..., 3:7], b[..., :3]) + a[..., :3]
    q = quat_mul(a[..., 3:7], b[..., 3:7])
    return jnp.concatenate([t, q], axis=-1)


def inv(g: jnp.ndarray) -> jnp.ndarray:
    qi = quat_inv(g[..., 3:7])
    t = -quat_rotate(qi, g[..., :3])
    return jnp.concatenate([t, qi], axis=-1)


def relative(gi: jnp.ndarray, gj: jnp.ndarray) -> jnp.ndarray:
    """g_ij = g_j ∘ g_i^-1 (maps frame-i points to frame j; relSE3,
    src/droid_kernels.cu:105-116)."""
    return mul(gj, inv(gi))


def act(g: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply to homogeneous points X[..., 4] = [x, y, z, w]:
    Y[:3] = R X[:3] + w t; Y[3] = w."""
    y = quat_rotate(g[..., 3:7], X[..., :3]) + X[..., 3:4] * g[..., :3]
    w = jnp.broadcast_to(X[..., 3:4], y.shape[:-1] + (1,))
    return jnp.concatenate([y, w], axis=-1)


def act3(g: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Apply to 3D points."""
    return quat_rotate(g[..., 3:7], x) + g[..., :3]


def matrix(g: jnp.ndarray) -> jnp.ndarray:
    """4x4 homogeneous matrix."""
    R = quat_to_matrix(g[..., 3:7])
    t = g[..., :3, None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# exp / log
# ---------------------------------------------------------------------------

def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rotation-vector -> unit quaternion (expSO3, src/droid_kernels.cu:119-141)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    theta_p4 = theta_sq * theta_sq
    small = theta_sq < 1e-8
    safe_theta = jnp.where(small, jnp.ones_like(theta), theta)
    imag = jnp.where(
        small,
        0.5 - theta_sq / 48.0 + theta_p4 / 3840.0,
        jnp.sin(0.5 * safe_theta) / safe_theta,
    )
    real = jnp.where(
        small,
        1.0 - theta_sq / 8.0 + theta_p4 / 384.0,
        jnp.cos(0.5 * safe_theta),
    )
    return jnp.concatenate([imag * phi, real], axis=-1)


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    # map to the qw >= 0 hemisphere so theta in [0, pi]
    sign = jnp.where(qw < 0, -jnp.ones_like(qw), jnp.ones_like(qw))
    qv = qv * sign
    qw = qw * sign
    s_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    s = jnp.sqrt(s_sq)
    small = s_sq < 1e-12
    safe_s = jnp.where(small, jnp.ones_like(s), s)
    theta = 2.0 * jnp.arctan2(s, qw)
    # k = theta / s; small-angle: theta ~ 2 s / qw => k ~ 2/qw * (1 - s^2/(3 qw^2))
    safe_qw = jnp.where(jnp.abs(qw) < _EPS, jnp.ones_like(qw), qw)
    k = jnp.where(small, 2.0 / safe_qw * (1.0 - s_sq / (3.0 * safe_qw * safe_qw)),
                  theta / safe_s)
    return k * qv


def _se3_exp_coeffs(theta_sq: jnp.ndarray):
    """a = (1-cos θ)/θ², b = (θ-sin θ)/θ³ with Taylor guards."""
    theta = jnp.sqrt(theta_sq)
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    safe_theta = jnp.sqrt(safe_sq)
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(safe_theta)) / safe_sq)
    b = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                  (safe_theta - jnp.sin(safe_theta)) / (safe_theta * safe_sq))
    return a, b


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """se(3) tangent [tau, phi] -> group element (expSE3,
    src/droid_kernels.cu:156-184, with exact Taylor small-angle terms)."""
    tau = xi[..., :3]
    phi = xi[..., 3:6]
    q = so3_exp(phi)
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    a, b = _se3_exp_coeffs(theta_sq)
    phi_x_tau = jnp.cross(phi, tau)
    t = tau + a * phi_x_tau + b * jnp.cross(phi, phi_x_tau)
    return jnp.concatenate([t, q], axis=-1)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Group element -> tangent [tau, phi] (inverse of exp)."""
    t = g[..., :3]
    phi = so3_log(g[..., 3:7])
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(theta_sq)
    small = theta_sq < 1e-8
    safe_sq = jnp.where(small, jnp.ones_like(theta_sq), theta_sq)
    safe_theta = jnp.sqrt(safe_sq)
    half = 0.5 * safe_theta
    # V^-1 = I - 1/2 [phi]x + c [phi]x^2,
    # c = (1 - θ cot(θ/2) / 2) / θ² ;  small θ: c ≈ 1/12 + θ²/720
    c = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / safe_sq,
    )
    phi_x_t = jnp.cross(phi, t)
    tau = t - 0.5 * phi_x_t + c * jnp.cross(phi, phi_x_t)
    return jnp.concatenate([tau, phi], axis=-1)


def retr(g: jnp.ndarray, xi: jnp.ndarray) -> jnp.ndarray:
    """Left retraction exp(xi) ∘ g (pose_retr_kernel semantics)."""
    return mul(exp(xi), g)


def adjT(g: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Ad(g)^T a for tangent covectors a[..., 6] = [a_v, a_w].

    Ad(g) = [[R, [t]x R], [0, R]], so
    Ad^T a = [R^T a_v,  R^T (a_v x t) + R^T a_w]
    (adjSE3, src/droid_kernels.cu:88-103).
    """
    qinv = quat_inv(g[..., 3:7])
    av = a[..., :3]
    aw = a[..., 3:6]
    t = g[..., :3]
    out_v = quat_rotate(qinv, av)
    out_w = quat_rotate(qinv, aw) + quat_rotate(qinv, jnp.cross(av, t))
    return jnp.concatenate([out_v, out_w], axis=-1)


def adj_matrix(g: jnp.ndarray) -> jnp.ndarray:
    """Explicit adjoint matrix Ad(g) [..., 6, 6] = [[R, [t]x R], [0, R]].

    Matches adjT: adjT(g, a) == a @ Ad(g) for covectors a (pinned in
    tests/test_lie.py). Used by the factored BA linearization — Ji-side
    Hessian blocks are per-edge 6x6 congruences of the Jj-side blocks
    (ba/edge_terms.py), so Ad is materialized once per edge instead of
    adjT once per pixel."""
    R = quat_to_matrix(g[..., 3:7])
    t = g[..., :3]
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    o = jnp.zeros_like(tx)
    S = jnp.stack([o, -tz, ty,
                   tz, o, -tx,
                   -ty, tx, o], axis=-1).reshape(t.shape[:-1] + (3, 3))
    top = jnp.concatenate([R, S @ R], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def normalize(g: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion part (numerical hygiene after long chains)."""
    q = g[..., 3:7]
    q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return jnp.concatenate([g[..., :3], q], axis=-1)
