"""Data-parallel train step on the virtual CPU mesh (covers shard_map DP,
restart accumulation, optimizer update end-to-end)."""

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.slow
def test_dryrun_multichip_2dev():
    import __graft_entry__ as g
    g.dryrun_multichip(2)


@pytest.mark.slow
def test_dryrun_multichip_as_driver():
    """Invoke dryrun_multichip exactly as the driver does: a fresh python
    process with NO device-count env prepared (the entry must bootstrap the
    virtual 8-device mesh itself, round-1 driver failure MULTICHIP_r01)."""
    import subprocess

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                        "GRAFT_MULTICHIP_RESPAWNED")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=560)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout


@pytest.mark.slow
def test_entry_compiles():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    Gs, disp_up, resid = out
    assert np.isfinite(np.asarray(Gs)).all()


def test_flow_step_grad_finite_at_zero_diff():
    """Estimate == GT makes every flow difference EXACTLY zero; the
    reference-style `v * norm(diff)` masking then backprops 0 * NaN (norm
    has an undefined gradient at 0). On TPU the bf16 matmul passes quantize
    est/GT coordinates to equal values over large regions, so this is the
    live failure mode that NaN'd training step 1 — the masked-safe sqrt in
    flow_step must give finite (zero) gradients here."""
    import jax
    import jax.numpy as jnp
    from droid_slam_tpu.lie import se3
    from droid_slam_tpu.train import losses

    rng = np.random.default_rng(3)
    N, H, W = 4, 32, 48
    q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    Ps = jnp.asarray(np.concatenate(
        [0.1 * rng.normal(size=(N, 3)), q], -1), jnp.float32)
    disps = jnp.asarray(rng.uniform(0.5, 2.0, size=(N, H, W)), jnp.float32)
    intr = jnp.asarray(
        np.broadcast_to([30.0, 30.0, W / 2, H / 2], (N, 4)), jnp.float32)
    ii, jj = losses.adjacent_pairs(N)
    coords0, val0 = losses.flow_gt(Ps, disps, intr, ii, jj)

    def loss(Gs, d):
        t, _, _ = losses.flow_step(coords0, val0, Gs, d, intr, ii, jj)
        return t

    v, (gG, gd) = jax.value_and_grad(loss, argnums=(0, 1))(Ps, disps)
    assert float(v) == 0.0
    assert np.isfinite(np.asarray(gG)).all()
    assert np.isfinite(np.asarray(gd)).all()


@pytest.mark.slow
def test_sample_loss_matches_unrolled():
    """The scan-based sample_loss must reproduce the unrolled reference
    path (droidnet.forward + list-based losses) to float tolerance — the
    scan is a compile-time/memory optimization, not a semantic change."""
    import jax
    import jax.numpy as jnp
    from droid_slam_tpu.models import droidnet, nets
    from droid_slam_tpu.train import losses
    from droid_slam_tpu.train.trainer import (TrainConfig, default_init,
                                              sample_loss)

    rng = np.random.default_rng(0)
    N, H, W = 4, 48, 64
    cfg = TrainConfig(n_frames=N)
    params = nets.init_params(jax.random.PRNGKey(1))
    images = rng.integers(0, 255, size=(N, H, W, 3)).astype(np.uint8)
    q = rng.normal(size=(N, 4)); q /= np.linalg.norm(q, axis=-1, keepdims=True)
    Ps = jnp.asarray(np.concatenate(
        [0.1 * rng.normal(size=(N, 3)), q], -1), jnp.float32)
    disps_gt = jnp.asarray(
        np.clip(rng.uniform(0.5, 2.0, size=(N, H, W)), 0.1, None), jnp.float32)
    intr = jnp.asarray(
        np.broadcast_to([40.0, 40.0, W / 2, H / 2], (N, 4)), jnp.float32)
    ii, jj = [], []
    for a in range(N):
        for b in range(N):
            if a != b and abs(a - b) <= 2:
                ii.append(a); jj.append(b)
    ii = jnp.asarray(ii); jj = jnp.asarray(jj)
    Gs0, disps0 = default_init(Ps, disps_gt)
    num_steps = 3

    loss, (metrics, final) = jax.jit(
        lambda p: sample_loss(p, images, Ps, disps_gt, intr, Gs0, disps0,
                              ii, jj, cfg, num_steps,
                              compute_dtype=jnp.float32))(params)

    def unrolled(p):
        Gs_list, disp_list, residual_list = droidnet.forward(
            p, images, Gs0, disps0, intr / 8.0, ii, jj,
            num_steps=num_steps, fixedp=2, compute_dtype=jnp.float32)
        geo, geo_m = losses.geodesic_loss(Ps, Gs_list, ii, jj,
                                          do_scale=False)
        res, res_m = losses.residual_loss(residual_list)
        flo, flo_m = losses.flow_loss(Ps, disps_gt, Gs_list, disp_list, intr)
        return (cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo,
                {**geo_m, **res_m, **flo_m}, Gs_list[-1],
                disp_list[-1][:, 3::8, 3::8])

    loss_u, metrics_u, Gs_u, dsub_u = jax.jit(unrolled)(params)

    np.testing.assert_allclose(float(loss), float(loss_u), rtol=2e-4)
    for k in metrics_u:
        # thresholded count metrics (epe<1px, err<0.1deg/0.01) flip boundary
        # pixels under float-level reassociation — compare loosely
        rtol = 2e-2 if k in ("1px", "bad_rot", "bad_tr") else 2e-3
        np.testing.assert_allclose(float(metrics[k]), float(metrics_u[k]),
                                   rtol=rtol, atol=1e-5, err_msg=k)
    # iterative GN amplifies float reassociation; allow ~1e-3 state drift
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(Gs_u),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(final[1]), np.asarray(dsub_u),
                               rtol=1e-2, atol=1e-3)

    # Gradients must match too (the training signal itself). Compare at TWO
    # steps: that already exercises the cross-iteration carry gradients
    # (GRU hidden chain + loss accumulation) — a dropped/extra gradient term
    # shows up at 10%+ — while keeping float drift bounded. At 3+ steps the
    # drift through 2x-GN Cholesky chains is chaotic in the compiled
    # program's fusion choices (observed 9e-3..6e-2 run-to-run), so a
    # tolerance there certifies nothing.
    ns_g = 2

    def unrolled_loss(p):
        Gs_list, disp_list, residual_list = droidnet.forward(
            p, images, Gs0, disps0, intr / 8.0, ii, jj,
            num_steps=ns_g, fixedp=2, compute_dtype=jnp.float32)
        geo, _ = losses.geodesic_loss(Ps, Gs_list, ii, jj, do_scale=False)
        res, _ = losses.residual_loss(residual_list)
        flo, _ = losses.flow_loss(Ps, disps_gt, Gs_list, disp_list, intr)
        return cfg.w1 * geo + cfg.w2 * res + cfg.w3 * flo

    g_scan = jax.jit(jax.grad(lambda p: sample_loss(
        p, images, Ps, disps_gt, intr, Gs0, disps0, ii, jj, cfg, ns_g,
        compute_dtype=jnp.float32)[0]))(params)
    g_unrl = jax.jit(jax.grad(unrolled_loss))(params)
    # compare in float64 — an f32 dot over millions of elements is itself
    # too noisy to certify a 1e-4-level agreement
    flat_s = np.concatenate([np.asarray(g_scan[k], np.float64).ravel()
                             for k in sorted(g_scan)])
    flat_u = np.concatenate([np.asarray(g_unrl[k], np.float64).ravel()
                             for k in sorted(g_unrl)])
    rel = np.linalg.norm(flat_s - flat_u) / np.linalg.norm(flat_u)
    assert rel < 1e-2, rel


def _tiny_batch(B, N=5, H=48, W=64, seed=0):
    import jax.numpy as jnp
    from droid_slam_tpu.data.synthetic import SyntheticBox
    from droid_slam_tpu.lie import se3

    db = SyntheticBox(n_clips=B, n_frames=N, image_size=(H, W), seed=seed)
    images, poses, disps, intr = zip(*[db[i] for i in range(B)])
    Ps = np.asarray(se3.inv(jnp.asarray(np.stack(poses))))
    ii = np.array([i for i in range(N) for j in range(N)
                   if 0 < abs(i - j) <= 1])
    jj = np.array([j for i in range(N) for j in range(N)
                   if 0 < abs(i - j) <= 1])
    return {"images": np.stack(images).astype(np.uint8),
            "poses": Ps.astype(np.float32),
            "disps": np.stack(disps).astype(np.float32),
            "intrinsics": np.stack(intr).astype(np.float32),
            "ii": ii, "jj": jj}


@pytest.mark.slow
def test_dp_step_matches_single_device():
    """The DDP-correctness property (reference train.py:25-33 NCCL
    all-reduce): a 4-way data-parallel shard_map step must produce the same
    updated params as one device stepping on the concatenated batch —
    gradient pmean == mean over the full batch."""
    import jax
    from droid_slam_tpu.parallel.mesh import (data_parallel_mesh, replicate,
                                              shard_batch)
    from droid_slam_tpu.train.trainer import (TrainConfig, init_train_state,
                                              make_train_step)

    assert len(jax.devices()) >= 4
    cfg = TrainConfig(restart_prob=0.0, n_frames=5)
    batch = _tiny_batch(B=4)
    key = jax.random.PRNGKey(42)

    results = {}
    for ndev in (1, 4):
        mesh = data_parallel_mesh(ndev)
        params, opt_state = init_train_state(cfg, seed=3)
        step_fn, _ = make_train_step(mesh, cfg, num_steps=1)
        params = replicate(mesh, params)
        opt_state = replicate(mesh, opt_state)
        sb = shard_batch(mesh, {k: batch[k] for k in
                                ("images", "poses", "disps", "intrinsics")})
        sb["ii"] = replicate(mesh, batch["ii"])
        sb["jj"] = replicate(mesh, batch["jj"])
        new_params, _, metrics = step_fn(params, opt_state, sb, key)
        results[ndev] = (jax.device_get(new_params),
                         {k: float(v) for k, v in metrics.items()})

    p1, m1 = results[1]
    p4, m4 = results[4]
    assert m1["grad_nanfrac"] == 0.0 and m4["grad_nanfrac"] == 0.0
    assert np.isclose(m1["loss"], m4["loss"], rtol=1e-4)
    for k in p1:
        np.testing.assert_allclose(p1[k], p4[k], rtol=2e-4, atol=2e-5,
                                   err_msg=k)
