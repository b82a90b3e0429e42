"""Inference-BA tests: windowed static-shape solver vs an independent dense
KKT solve with the CUDA kernel's exact semantics (fixed frames below the
window, RGB-D prior, damp-after-Schur, window masking)."""

import numpy as np
import jax.numpy as jnp

from droid_slam_tpu.ba import edge_terms, inference
from droid_slam_tpu.geom import projective as pops
from droid_slam_tpu.lie import se3

ALPHA = inference.ALPHA


def setup(rng, n=5, h=4, w=4, with_sensor=False):
    xi = np.zeros((n, 6), np.float32)
    xi[:, 0] = 0.15 * np.arange(n)
    xi[:, 4] = 0.01 * np.arange(n)
    poses_gt = se3.exp(jnp.asarray(xi))
    disps_gt = jnp.asarray((0.8 + 0.2 * rng.uniform(size=(n, h, w))).astype(np.float32))
    intr4 = jnp.asarray(np.array([20.0, 20.0, w / 2, h / 2], np.float32))
    intr = jnp.broadcast_to(intr4, (n, 4))
    ii, jj = [], []
    for a in range(n):
        for b in range(n):
            if 0 < abs(a - b) <= 2:
                ii.append(a); jj.append(b)
    ii = np.asarray(ii); jj = np.asarray(jj)
    target, _, _ = pops.projective_transform(poses_gt, disps_gt, intr,
                                             jnp.asarray(ii), jnp.asarray(jj))
    target = target.reshape(len(ii), h * w, 2).transpose(0, 2, 1)

    pert = rng.normal(size=(n, 6)).astype(np.float32) * 0.02
    pert[:2] = 0  # anchor frames stay at GT so GT remains the optimum
    poses0 = se3.retr(poses_gt, jnp.asarray(pert))
    disps0 = disps_gt * (1 + 0.05 * jnp.asarray(rng.normal(size=(n, h, w))
                                                .astype(np.float32)))
    disps_sens = np.zeros((n, h, w), np.float32)
    if with_sensor:
        disps_sens[2] = np.asarray(disps_gt[2])
    damping = 1e-6 * np.ones((n, h, w), np.float32)
    return (poses_gt, disps_gt, poses0, disps0, jnp.asarray(disps_sens),
            jnp.asarray(damping), intr4, ii, jj, target)


def reference_step(poses, disps, disps_sens, damping, intr4, target, weight,
                   ii, jj, t0, t1, lm, ep):
    """Straight dense transcription of ba_cuda (single GN iteration)."""
    n, h, w = disps.shape
    hw = h * w
    E = len(ii)
    intr = jnp.broadcast_to(intr4, (n, 4))
    t = edge_terms.linearize(poses, disps, intr, target, weight,
                             jnp.asarray(ii), jnp.asarray(jj),
                             min_depth=0.25, zero_stereo_pose=True)
    Hii, Hij, Hji, Hjj, vi, vj = (np.asarray(x) for x in
                                  edge_terms.pose_blocks(t))
    Ei, Ej, Cz, bz = (np.asarray(x) for x in edge_terms.depth_blocks(t))

    P = t1 - t0
    kx = sorted(set(range(t0, t1)) | set(int(x) for x in ii))
    kidx = {k: i for i, k in enumerate(kx)}
    K = len(kx)

    A = np.zeros((P * 6, P * 6)); v = np.zeros(P * 6)
    for e in range(E):
        a, b = ii[e] - t0, jj[e] - t0
        for (r_, c_, blk) in [(a, a, Hii[e]), (a, b, Hij[e]),
                              (b, a, Hji[e]), (b, b, Hjj[e])]:
            if 0 <= r_ < P and 0 <= c_ < P:
                A[r_*6:(r_+1)*6, c_*6:(c_+1)*6] += blk
        if 0 <= a < P:
            v[a*6:(a+1)*6] += vi[e]
        if 0 <= b < P:
            v[b*6:(b+1)*6] += vj[e]

    # depth diag + rhs with sensor prior (droid_kernels.cu:1404-1408)
    eta = 0.2 * np.asarray(damping).reshape(n, hw) + 1e-7
    C = np.zeros((K, hw)); wz = np.zeros((K, hw))
    for e in range(E):
        C[kidx[ii[e]]] += Cz[e]
        wz[kidx[ii[e]]] += bz[e]
    sens = np.asarray(disps_sens).reshape(n, hw)
    dsp = np.asarray(disps).reshape(n, hw)
    for k in kx:
        m = (sens[k] > 0).astype(np.float64)
        C[kidx[k]] += m * ALPHA + (1 - m) * eta[k]
        wz[kidx[k]] -= m * ALPHA * (dsp[k] - sens[k])
    Q = 1.0 / C

    # Schur rows: Ei rows for ts frames + Ej rows for edges w/ pose in window
    Emat = np.zeros((P * 6, K * hw))
    for f in range(t0, t1):
        for e in range(E):
            if ii[e] == f:
                Emat[(f-t0)*6:(f-t0+1)*6, kidx[f]*hw:(kidx[f]+1)*hw] += Ei[e]
    for e in range(E):
        b = jj[e] - t0
        if 0 <= b < P:
            Emat[b*6:(b+1)*6, kidx[ii[e]]*hw:(kidx[ii[e]]+1)*hw] += Ej[e]

    S = Emat @ (Q.reshape(-1)[:, None] * Emat.T)
    M = A - S
    M += np.diag(ep + lm * np.diag(M))
    rhs = v - Emat @ (Q.reshape(-1) * wz.reshape(-1))
    dx = np.linalg.solve(M, rhs).reshape(P, 6)
    # EvT6x1 quirk: pose t0 (solve-local index 0) never reaches dz
    # (droid_kernels.cu:1116-1117; reproduced by ba/inference.py default)
    dx_bs = dx.copy()
    if inference._evt_quirk():
        dx_bs[0] = 0.0
    dz = Q.reshape(-1) * (wz.reshape(-1) - Emat.T @ dx_bs.reshape(-1))

    poses_out = np.asarray(poses).copy()
    poses_out[t0:t1] = np.asarray(se3.retr(poses[t0:t1],
                                           jnp.asarray(dx, jnp.float32)))
    disps_out = dsp.copy()
    for k in kx:
        disps_out[k] += dz[kidx[k]*hw:(kidx[k]+1)*hw]
    disps_out = np.clip(disps_out, 0.001, None).reshape(n, h, w)
    return poses_out, disps_out


def test_windowed_matches_dense_reference(rng):
    for with_sensor in (False, True):
        (poses_gt, disps_gt, poses0, disps0, disps_sens, damping, intr4,
         ii, jj, target) = setup(rng, with_sensor=with_sensor)
        n, h, w = disps_gt.shape
        E = len(ii)
        weight = jnp.asarray(rng.uniform(0.3, 1.0, size=(E, 2, h * w))
                             .astype(np.float32))
        t0, t1 = 2, n  # frames 0,1 fixed but referenced by edges
        lm, ep = 1e-4, 0.1

        # note: ba_windowed donates poses/disps — run the reference first
        p2, d2 = reference_step(poses0, disps0, disps_sens, damping, intr4,
                                target, weight, ii, jj, t0, t1, lm, ep)

        shape, plan = inference.build_plan(ii, jj, t0, t1, iters=1)
        p1, d1 = inference.ba_windowed(
            shape, poses0, disps0, disps_sens, damping, intr4,
            _pad_edges(target, shape.edges), _pad_edges(weight, shape.edges),
            plan, lm, ep)
        np.testing.assert_allclose(np.asarray(p1), p2, atol=5e-4)
        np.testing.assert_allclose(np.asarray(d1), d2, atol=5e-4)


def _pad_edges(x, E):
    pad = E - x.shape[0]
    if pad <= 0:
        return jnp.asarray(x)
    return jnp.concatenate([jnp.asarray(x),
                            jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)


def test_windowed_converges(rng):
    (poses_gt, disps_gt, poses0, disps0, disps_sens, damping, intr4,
     ii, jj, target) = setup(rng)
    n, h, w = disps_gt.shape
    E = len(ii)
    weight = jnp.ones((E, 2, h * w), jnp.float32)
    t0, t1 = 1, n
    shape, plan = inference.build_plan(ii, jj, t0, t1, iters=2)
    poses, disps = poses0, disps0
    tgt = _pad_edges(target, shape.edges)
    wgt = _pad_edges(weight, shape.edges)
    for _ in range(6):
        poses, disps = inference.ba_windowed(
            shape, poses, disps, disps_sens, damping, intr4, tgt, wgt,
            plan, 1e-4, 0.1)
    coords, _, _ = pops.projective_transform(
        poses, disps, jnp.broadcast_to(intr4, (n, 4)),
        jnp.asarray(ii), jnp.asarray(jj))
    coords = coords.reshape(E, h * w, 2).transpose(0, 2, 1)
    resid = float(jnp.mean(jnp.abs(coords - target)))
    assert resid < 5e-3


def test_motion_only_matches_pose_solve(rng):
    (poses_gt, disps_gt, poses0, disps0, disps_sens, damping, intr4,
     ii, jj, target) = setup(rng)
    n, h, w = disps_gt.shape
    E = len(ii)
    weight = jnp.ones((E, 2, h * w), jnp.float32)
    t0, t1 = 2, n
    shape, plan = inference.build_plan(ii, jj, t0, t1, iters=4,
                                       motion_only=True)
    poses, disps = poses0, disps_gt + 0  # GT structure (copy: buffers donate)
    tgt = _pad_edges(target, shape.edges)
    wgt = _pad_edges(weight, shape.edges)
    for _ in range(3):
        poses, disps = inference.ba_windowed(
            shape, poses, disps, disps_sens, damping, intr4, tgt, wgt,
            plan, 1e-4, 0.1)
    # disps untouched in motion-only
    np.testing.assert_allclose(np.asarray(disps), np.asarray(disps_gt))
    err = np.asarray(se3.log(se3.mul(se3.inv(poses), poses_gt)))
    assert np.abs(err[t0:]).max() < 1e-2


def test_factored_blocks_match_unfactored(rng):
    """The factored linearization (Ji = -Jj @ Ad, i-side blocks via per-edge
    6x6 congruences) must reproduce the per-pixel Ji contraction exactly up
    to f32 reassociation — including stereo edges (ii == jj) in both weight
    conventions."""
    (poses_gt, disps_gt, poses0, disps0, disps_sens, damping, intr4,
     ii, jj, target) = setup(rng)
    n, h, w = disps_gt.shape
    ii = np.concatenate([ii, [1]])  # one stereo edge
    jj = np.concatenate([jj, [1]])
    E = len(ii)
    target = jnp.concatenate(
        [target, target[:1] + 0.3], axis=0)
    weight = jnp.asarray(rng.uniform(0.2, 1.0, size=(E, 2, h * w))
                         .astype(np.float32))
    intr = jnp.broadcast_to(intr4, (n, 4))

    for zero_stereo in (True, False):
        kw = dict(edge_valid=None, min_depth=0.25,
                  zero_stereo_pose=zero_stereo)
        tf = edge_terms.linearize(poses0, disps0, intr, target, weight,
                                  jnp.asarray(ii), jnp.asarray(jj),
                                  factored=True, **kw)
        tu = edge_terms.linearize(poses0, disps0, intr, target, weight,
                                  jnp.asarray(ii), jnp.asarray(jj),
                                  factored=False, **kw)
        assert tf.Ji is None and tu.Ji is not None
        bf = edge_terms.pose_blocks(tf) + edge_terms.depth_blocks(tf)
        bu = edge_terms.pose_blocks(tu) + edge_terms.depth_blocks(tu)
        for a, b in zip(bf, bu):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-5)


def test_schur_assembly_proj_matches_scatter(rng, monkeypatch):
    """The scatter-free one-hot Schur assembly (DROID_SCHUR_ASSEMBLY=proj)
    is bit-identical to the default segment-sum formulation."""
    import os
    import jax

    B, h, w = 12, 8, 10
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (B, 1))
    poses[:, :3] += 0.1 * rng.normal(size=(B, 3)).astype(np.float32)
    disps = (1.0 + 0.2 * rng.uniform(size=(B, h, w))).astype(np.float32)
    disps_sens = np.zeros((B, h, w), np.float32)
    damping = 0.1 * np.ones((B, h, w), np.float32)
    intr = np.array([50., 50., w / 2, h / 2], np.float32)
    E, NW = 24, 8
    ii = rng.integers(0, NW, E)
    jj = (ii + 1 + rng.integers(0, 3, E)) % NW
    target = (rng.uniform(size=(E, 2, h * w))
              * np.array([w, h], np.float64)[None, :, None]).astype(np.float32)
    weight = rng.uniform(size=(E, 2, h * w)).astype(np.float32)

    shape, plan = inference.build_plan(ii, jj, 1, NW, iters=2)
    pad = ((0, shape.edges - E), (0, 0), (0, 0))
    args = (jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(disps_sens),
            jnp.asarray(damping), jnp.asarray(intr),
            jnp.asarray(np.pad(target, pad)), jnp.asarray(np.pad(weight, pad)),
            plan, jnp.asarray(1e-4), jnp.asarray(0.1))

    outs = {}
    for mode in ("scatter", "proj"):
        monkeypatch.setenv("DROID_SCHUR_ASSEMBLY", mode)
        fn = jax.jit(inference.ba_iterations, static_argnames=("shape",))
        outs[mode] = jax.tree.map(np.asarray, fn(shape, *args))
    np.testing.assert_array_equal(outs["proj"][0], outs["scatter"][0])
    np.testing.assert_array_equal(outs["proj"][1], outs["scatter"][1])


def test_edge_chunked_linearization_bit_exact(rng, monkeypatch):
    """The edge-chunked Gauss-Newton linearization (global-BA memory bound,
    DROID_BA_EDGE_CHUNK) is BIT-identical to the single-pass form: the
    chunk boundary crosses no reduction."""
    import jax

    B, h, w = 12, 8, 10
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (B, 1))
    poses[:, :3] += 0.1 * rng.normal(size=(B, 3)).astype(np.float32)
    disps = (1.0 + 0.2 * rng.uniform(size=(B, h, w))).astype(np.float32)
    disps_sens = np.zeros((B, h, w), np.float32)
    damping = 0.1 * np.ones((B, h, w), np.float32)
    intr = np.array([50., 50., w / 2, h / 2], np.float32)
    E, NW = 40, 8
    ii = rng.integers(0, NW, E)
    jj = (ii + 1 + rng.integers(0, 3, E)) % NW
    target = (rng.uniform(size=(E, 2, h * w))
              * np.array([w, h], np.float64)[None, :, None]).astype(np.float32)
    weight = rng.uniform(size=(E, 2, h * w)).astype(np.float32)

    shape, plan = inference.build_plan(ii, jj, 1, NW, iters=2)
    pad = ((0, shape.edges - E), (0, 0), (0, 0))
    args = (jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(disps_sens),
            jnp.asarray(damping), jnp.asarray(intr),
            jnp.asarray(np.pad(target, pad)), jnp.asarray(np.pad(weight, pad)),
            plan, jnp.asarray(1e-4), jnp.asarray(0.1))

    outs = {}
    # shape.edges buckets to 64; chunk 16 => 4 chunks vs 1 full pass; chunk
    # 24 => 2 full chunks + a 16-edge REMAINDER chunk (round 4: a
    # divisibility guard silently skipped chunking at the real t=1000 edge
    # count and the un-chunked linearization OOM'd the global BA)
    for chunk in ("16", "24", "100000"):
        monkeypatch.setenv("DROID_BA_EDGE_CHUNK", chunk)
        fn = jax.jit(inference.ba_iterations, static_argnames=("shape",))
        outs[chunk] = jax.tree.map(np.asarray, fn(shape, *args))
    np.testing.assert_array_equal(outs["16"][0], outs["100000"][0])
    np.testing.assert_array_equal(outs["16"][1], outs["100000"][1])
    np.testing.assert_array_equal(outs["24"][0], outs["100000"][0])
    np.testing.assert_array_equal(outs["24"][1], outs["100000"][1])


def test_big_window_flat_assembly_bit_exact(rng, monkeypatch):
    """The global-BA assembly path (flat-lane [NW*NW,36] pose grid +
    fori_loop Schur accumulation, engaged at NW >= _BIG_NW) is bit-identical
    to the frontend's unrolled [NW,NW,6,6] form — same adds, same order."""
    import jax

    B, h, w = 12, 8, 10
    poses = np.tile(np.array([0, 0, 0, 0, 0, 0, 1.0], np.float32), (B, 1))
    poses[:, :3] += 0.1 * rng.normal(size=(B, 3)).astype(np.float32)
    disps = (1.0 + 0.2 * rng.uniform(size=(B, h, w))).astype(np.float32)
    disps_sens = np.zeros((B, h, w), np.float32)
    damping = 0.1 * np.ones((B, h, w), np.float32)
    intr = np.array([50., 50., w / 2, h / 2], np.float32)
    E, NW = 40, 8
    ii = rng.integers(0, NW, E)
    jj = (ii + 1 + rng.integers(0, 3, E)) % NW
    target = (rng.uniform(size=(E, 2, h * w))
              * np.array([w, h], np.float64)[None, :, None]).astype(np.float32)
    weight = rng.uniform(size=(E, 2, h * w)).astype(np.float32)

    shape, plan = inference.build_plan(ii, jj, 1, NW, iters=2)
    pad = ((0, shape.edges - E), (0, 0), (0, 0))
    args = (jnp.asarray(poses), jnp.asarray(disps), jnp.asarray(disps_sens),
            jnp.asarray(damping), jnp.asarray(intr),
            jnp.asarray(np.pad(target, pad)), jnp.asarray(np.pad(weight, pad)),
            plan, jnp.asarray(1e-4), jnp.asarray(0.1))

    outs = {}
    for thr in (8, 10 ** 6):   # NW bucket is 16: 8 engages, 1e6 doesn't
        monkeypatch.setattr(inference, "_BIG_NW", thr)
        fn = jax.jit(inference.ba_iterations, static_argnames=("shape",))
        outs[thr] = jax.tree.map(np.asarray, fn(shape, *args))
    np.testing.assert_array_equal(outs[8][0], outs[10 ** 6][0])
    np.testing.assert_array_equal(outs[8][1], outs[10 ** 6][1])


def test_ba_degenerate_stays_finite(rng):
    """Overflow robustness (bench.py terminate on the no-parallax scene):
    disps that ran away to fp32 extremes must not NaN the BA — the _DISP_MAX
    ceiling bounds the final clamp and the non-finite step guard turns an
    overflowed GN iteration into a no-op. The reference NaNs here
    (depth_video.py:226 has only a floor)."""
    (_, _, poses0, disps0, disps_sens, damping, intr4,
     ii, jj, target) = setup(rng)
    n, h, w = np.asarray(disps0).shape
    E = len(ii)
    weight = jnp.ones((E, 2, h * w), jnp.float32)
    shape, plan = inference.build_plan(ii, jj, 1, n, iters=3)
    tgt = _pad_edges(target, shape.edges)
    wgt = _pad_edges(weight, shape.edges)

    # the post-normalize state observed on the degenerate bench scene:
    # huge translations + disparities spanning ~25 decades
    poses_bad = jnp.asarray(np.asarray(poses0)
                            * np.array([1e14, 1e14, 1e14, 1, 1, 1, 1],
                                       np.float32))
    disps_bad = disps0 * jnp.asarray(
        10.0 ** rng.uniform(-11, 15, size=(n, h, w)).astype(np.float32))

    poses, disps = poses_bad, disps_bad
    for _ in range(3):
        poses, disps = inference.ba_windowed(
            shape, poses, disps, disps_sens, damping, intr4, tgt, wgt,
            plan, 1e-4, 0.1)
    poses, disps = np.asarray(poses), np.asarray(disps)
    assert np.isfinite(poses).all()
    assert np.isfinite(disps).all()
    assert disps.max() <= inference._DISP_MAX
    assert disps.min() >= 0.001

    # NaN already in the inputs (weights): the guard must keep the iterate
    # instead of propagating it into poses/disps
    wgt_nan = wgt.at[0, 0, 0].set(jnp.nan)
    p2, d2 = inference.ba_windowed(
        shape, jnp.asarray(np.asarray(poses)), jnp.asarray(disps) + 0,
        disps_sens, damping, intr4, tgt, wgt_nan, plan, 1e-4, 0.1)
    assert np.isfinite(np.asarray(p2)).all()
    assert np.isfinite(np.asarray(d2)).all()
