"""SE3/Sim3 unit tests against closed forms and scipy cross-checks.

The reference has no unit tests (SURVEY.md §4); these validate our pure-JAX
Lie ops against the math of /root/reference/src/droid_kernels.cu:67-184.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from droid_slam_tpu.lie import se3, sim3


def random_pose(rng, n=()):
    q = rng.normal(size=n + (4,))
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    t = rng.normal(size=n + (3,))
    return jnp.asarray(np.concatenate([t, q], axis=-1), dtype=jnp.float64
                       if False else jnp.float32)


def test_quat_rotate_matches_scipy(rng):
    g = np.asarray(random_pose(rng, (32,)))
    v = rng.normal(size=(32, 3)).astype(np.float32)
    out = np.asarray(se3.quat_rotate(jnp.asarray(g[:, 3:7]), jnp.asarray(v)))
    # scipy uses [x,y,z,w] too
    expect = Rotation.from_quat(g[:, 3:7]).apply(v)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_mul_inv_identity(rng):
    g = random_pose(rng, (16,))
    gi = se3.inv(g)
    e = se3.mul(g, gi)
    np.testing.assert_allclose(np.asarray(e[:, :3]), 0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(e[:, 6])), 1, atol=1e-5)


def test_act_matches_matrix(rng):
    g = random_pose(rng, (8,))
    X = rng.normal(size=(8, 4)).astype(np.float32)
    Y = np.asarray(se3.act(g, jnp.asarray(X)))
    M = np.asarray(se3.matrix(g))
    # homogeneous action: [R, t; 0, 1] @ [x; w] with w carried through
    expect = np.einsum("nij,nj->ni", M, X)
    np.testing.assert_allclose(Y, expect, atol=1e-5)


def test_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 6)).astype(np.float32) * 0.5
    g = se3.exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.log(g))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_exp_small_angle(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 1e-6
    g = np.asarray(se3.exp(jnp.asarray(xi)))
    np.testing.assert_allclose(g[:, :3], xi[:, :3], atol=1e-8)
    np.testing.assert_allclose(g[:, 3:6], 0.5 * xi[:, 3:6], atol=1e-8)
    np.testing.assert_allclose(g[:, 6], 1.0, atol=1e-8)


def test_exp_matches_scipy_rotation(rng):
    phi = rng.normal(size=(32, 3)).astype(np.float32)
    q = np.asarray(se3.so3_exp(jnp.asarray(phi)))
    expect = Rotation.from_rotvec(phi).as_quat()
    # sign ambiguity
    sign = np.sign(np.sum(q * expect, axis=-1, keepdims=True))
    np.testing.assert_allclose(q, sign * expect, atol=1e-5)


def test_retr_composition(rng):
    g = random_pose(rng, (4,))
    xi = rng.normal(size=(4, 6)).astype(np.float32) * 0.1
    out = se3.retr(g, jnp.asarray(xi))
    expect = se3.mul(se3.exp(jnp.asarray(xi)), g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_adjT_definition(rng):
    """adjT(g, a) must equal Ad(g)^T a with Ad from the matrix rep."""
    g = random_pose(rng, (8,))
    a = rng.normal(size=(8, 6)).astype(np.float32)
    R = np.asarray(se3.quat_to_matrix(g[..., 3:7]))
    t = np.asarray(g[..., :3])

    def skew(v):
        o = np.zeros(v.shape[:-1] + (3, 3), dtype=v.dtype)
        o[..., 0, 1], o[..., 0, 2] = -v[..., 2], v[..., 1]
        o[..., 1, 0], o[..., 1, 2] = v[..., 2], -v[..., 0]
        o[..., 2, 0], o[..., 2, 1] = -v[..., 1], v[..., 0]
        return o

    Ad = np.zeros((8, 6, 6), dtype=np.float32)
    Ad[:, :3, :3] = R
    Ad[:, :3, 3:] = np.einsum("nij,njk->nik", skew(t), R)
    Ad[:, 3:, 3:] = R
    expect = np.einsum("nji,nj->ni", Ad, a)
    out = np.asarray(se3.adjT(g, jnp.asarray(a)))
    np.testing.assert_allclose(out, expect, atol=1e-5)
    # adj_matrix must agree with the inline Ad construction AND satisfy
    # adjT(g, a) == a @ Ad(g) (the identity its docstring claims is pinned
    # here; consumed by the factored BA linearization, ba/edge_terms.py)
    Ad_fn = np.asarray(se3.adj_matrix(jnp.asarray(g)))
    np.testing.assert_allclose(Ad_fn, Ad, atol=1e-5)
    np.testing.assert_allclose(
        out, np.einsum("ni,nij->nj", a, Ad_fn), atol=1e-5)


def test_relative_maps_points(rng):
    """X_j = (g_j g_i^-1) X_i when X_f = g_f X_world."""
    gi, gj = random_pose(rng, (2,))
    Xw = rng.normal(size=(5, 3)).astype(np.float32)
    Xi = np.asarray(se3.act3(gi, jnp.asarray(Xw)))
    Xj = np.asarray(se3.act3(gj, jnp.asarray(Xw)))
    gij = se3.relative(gi[None], gj[None])
    out = np.asarray(se3.act3(gij, jnp.asarray(Xi)))
    np.testing.assert_allclose(out, Xj, atol=1e-4)


# ---------------------------------------------------------------------------
# Sim3
# ---------------------------------------------------------------------------

def test_sim3_mul_inv(rng):
    g = np.asarray(random_pose(rng, (8,)))
    s = np.exp(rng.normal(size=(8, 1)) * 0.3).astype(np.float32)
    G = jnp.asarray(np.concatenate([g, s], axis=-1))
    e = np.asarray(sim3.mul(G, sim3.inv(G)))
    np.testing.assert_allclose(e[:, :3], 0, atol=1e-5)
    np.testing.assert_allclose(e[:, 7], 1, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(64, 7)).astype(np.float32) * 0.4
    G = sim3.exp(jnp.asarray(xi))
    xi2 = np.asarray(sim3.log(G))
    np.testing.assert_allclose(xi2, xi, atol=2e-4)


def test_sim3_exp_reduces_to_se3(rng):
    xi6 = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    xi7 = np.concatenate([xi6, np.zeros((16, 1), np.float32)], axis=-1)
    G = np.asarray(sim3.exp(jnp.asarray(xi7)))
    g = np.asarray(se3.exp(jnp.asarray(xi6)))
    np.testing.assert_allclose(G[:, :7], g, atol=1e-5)
    np.testing.assert_allclose(G[:, 7], 1.0, atol=1e-6)


def test_sim3_act_scale():
    G = jnp.asarray([[1.0, 2.0, 3.0, 0, 0, 0, 1, 2.0]])
    X = jnp.asarray([[1.0, 1.0, 1.0, 1.0]])
    Y = np.asarray(sim3.act(G, X))
    np.testing.assert_allclose(Y, [[3.0, 4.0, 5.0, 1.0]], atol=1e-6)
