"""Network parity tests: activations vs the reference torch modules with
identical weights (the torch-only files extractor.py / gru.py import cleanly
on CPU; SURVEY.md §4 test seams)."""

import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from droid_slam_tpu.models import nets

REF = "/root/reference/droid_slam"
HAS_REF = os.path.isdir(REF)


def torch_state_to_params(state, prefix=""):
    params = {}
    for k, v in state.items():
        arr = v.detach().numpy()
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        params[prefix + k] = jnp.asarray(arr)
    return params


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_basic_encoder_matches_torch(rng):
    import torch
    sys.path.insert(0, REF)
    from modules.extractor import BasicEncoder

    torch.manual_seed(0)
    enc = BasicEncoder(output_dim=128, norm_fn="instance").eval()
    params = torch_state_to_params(enc.state_dict(), prefix="fnet.")

    x = rng.normal(size=(1, 2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()  # [1,2,128,4,6]

    xin = jnp.asarray(x.reshape(2, 3, 32, 48).transpose(0, 2, 3, 1))
    out = np.asarray(nets.basic_encoder(params, "fnet", xin, "instance"))
    out = out.transpose(0, 3, 1, 2)[None]
    np.testing.assert_allclose(out, ref, atol=2e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_encoder_none_norm_matches_torch(rng):
    import torch
    sys.path.insert(0, REF)
    from modules.extractor import BasicEncoder

    torch.manual_seed(1)
    enc = BasicEncoder(output_dim=256, norm_fn="none").eval()
    params = torch_state_to_params(enc.state_dict(), prefix="cnet.")
    x = rng.normal(size=(1, 1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()
    xin = jnp.asarray(x.reshape(1, 3, 32, 32).transpose(0, 2, 3, 1))
    out = np.asarray(nets.basic_encoder(params, "cnet", xin, "none"))
    np.testing.assert_allclose(out.transpose(0, 3, 1, 2)[None], ref, atol=2e-4)


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_conv_gru_matches_torch(rng):
    import torch
    sys.path.insert(0, REF)
    from modules.gru import ConvGRU

    torch.manual_seed(2)
    gru = ConvGRU(128, 128 + 128 + 64).eval()
    params = torch_state_to_params(gru.state_dict(), prefix="update.gru.")

    net = rng.normal(size=(2, 128, 8, 8)).astype(np.float32)
    inp = rng.normal(size=(2, 320, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = gru(torch.from_numpy(net), torch.from_numpy(inp)).numpy()

    out = nets.conv_gru(params, jnp.asarray(net.transpose(0, 2, 3, 1)),
                        jnp.asarray(inp.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2), ref,
                               atol=2e-4)


def test_param_shapes_cover_reference_state_dict():
    """Every torch state_dict tensor of the reference DroidNet must map to a
    parameter we allocate (guards checkpoint compatibility)."""
    if not HAS_REF:
        pytest.skip("no reference")
    import torch
    sys.path.insert(0, REF)
    from modules.extractor import BasicEncoder

    shapes = nets.param_shapes()
    allocated = set()
    for name, (kh, kw, cin, cout) in shapes.items():
        allocated.add(name + ".weight")
        allocated.add(name + ".bias")

    fnet = BasicEncoder(output_dim=128, norm_fn="instance")
    cnet = BasicEncoder(output_dim=256, norm_fn="none")
    ref_keys = {f"fnet.{k}" for k in fnet.state_dict()} | \
               {f"cnet.{k}" for k in cnet.state_dict()}
    missing = {k for k in ref_keys if k not in allocated}
    assert not missing, f"unmapped reference params: {sorted(missing)[:8]}"

    # shape agreement
    for k, v in fnet.state_dict().items():
        name = f"fnet.{k}"
        if v.ndim == 4:
            kh, kw, cin, cout = shapes[name.rsplit(".", 1)[0]]
            assert tuple(v.shape) == (cout, cin, kh, kw), name


def test_cvx_upsample_shapes(rng):
    data = jnp.asarray(rng.normal(size=(2, 4, 5, 1)).astype(np.float32))
    mask = jnp.asarray(rng.normal(size=(2, 4, 5, 9 * 64)).astype(np.float32))
    up = nets.cvx_upsample(data, mask)
    assert up.shape == (2, 32, 40, 1)
    # constant field stays constant under convex combination away from the
    # zero-padded border (same border behavior as torch F.unfold w/ padding=1)
    const = jnp.ones((2, 4, 5, 1))
    up2 = np.asarray(nets.cvx_upsample(const, mask))
    np.testing.assert_allclose(up2[:, 8:-8, 8:-8], 1.0, atol=1e-5)


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_cvx_upsample_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    def torch_cvx(data, mask):
        # droid_net.py:21-35
        batch, ht, wd, dim = data.shape
        data = data.permute(0, 3, 1, 2)
        mask = mask.view(batch, 1, 9, 8, 8, ht, wd)
        mask = torch.softmax(mask, dim=2)
        up_data = F.unfold(data, [3, 3], padding=1)
        up_data = up_data.view(batch, dim, 9, 1, 1, ht, wd)
        up_data = torch.sum(mask * up_data, dim=2)
        up_data = up_data.permute(0, 4, 2, 5, 3, 1)
        return up_data.reshape(batch, 8 * ht, 8 * wd, dim)

    data = rng.normal(size=(1, 3, 4, 2)).astype(np.float32)
    # torch layout for mask is [B, 9*64, h, w]
    mask_t = rng.normal(size=(1, 9 * 64, 3, 4)).astype(np.float32)
    ref = torch_cvx(torch.from_numpy(data), torch.from_numpy(mask_t)).numpy()

    mask_j = jnp.asarray(mask_t.transpose(0, 2, 3, 1))
    out = np.asarray(nets.cvx_upsample(jnp.asarray(data), mask_j))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_update_module_runs(rng):
    params = nets.init_params(jax.random.PRNGKey(0))
    E, h, w = 3, 8, 8
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    corr = jnp.asarray(rng.normal(size=(E, h, w, 196)).astype(np.float32))
    ii = jnp.asarray([0, 0, 1])
    out = nets.update_module(params, net, inp, corr, ii=ii, num_frames=2)
    net2, delta, weight, eta, upmask = out
    assert net2.shape == (E, h, w, 128)
    assert delta.shape == (E, h, w, 2)
    assert weight.shape == (E, h, w, 2)
    assert eta.shape == (2, h, w)
    assert upmask.shape == (2, h, w, 576)
    assert np.all(np.asarray(weight) >= 0) and np.all(np.asarray(weight) <= 1)
    assert np.all(np.asarray(eta) >= 0)


def test_conv_gru_pre_matches_monolithic(rng):
    """The hoisted-context path (gru_context_pre + 192ch conv_gru) must match
    the monolithic 320ch-input conv_gru: conv(concat(net,inp,c,f), W) ==
    conv(net,Wn)+conv(inp,Wi)+conv(cf,Wcf). Split partial sums reassociate
    the accumulation, so exact only up to f32 rounding (ADVICE r2)."""
    params = nets.init_params(jax.random.PRNGKey(1))
    E, h, w = 3, 8, 8
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    cf = jnp.asarray(rng.normal(size=(E, h, w, 192)).astype(np.float32))

    mono = nets.conv_gru(params, net, jnp.concatenate([inp, cf], axis=-1))
    pre = nets.gru_context_pre(params, inp)
    split = nets.conv_gru(params, net, cf, pre=pre)
    np.testing.assert_allclose(np.asarray(split), np.asarray(mono),
                               atol=2e-5, rtol=1e-5)


def test_conv_gru_qfuse_matches_default(rng, monkeypatch):
    """DROID_GRU_QFUSE=1 (one 320->128 conv over [r*net|inp] absorbing the
    cfq round trip) must match the split q path: same weight columns contract
    the same inputs, one f32 accumulator, so equal up to f32 reassociation."""
    params = nets.init_params(jax.random.PRNGKey(1))
    E, h, w = 3, 8, 8
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    cf = jnp.asarray(rng.normal(size=(E, h, w, 192)).astype(np.float32))
    pre = nets.gru_context_pre(params, inp)

    # _GRU_QFUSE defaults to True — force the split path for the baseline
    # so this actually compares split vs fused (advisor r4 finding).
    monkeypatch.setattr(nets, "_GRU_QFUSE", False)
    base = nets.conv_gru(params, net, cf, pre=pre)
    monkeypatch.setattr(nets, "_GRU_QFUSE", True)
    fused = nets.conv_gru(params, net, cf, pre=pre)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=2e-5, rtol=1e-5)


def test_update_module_pre_and_deferred_upmask(rng):
    """update_module(pre=..., compute_upmask=False) + a post-hoc graph_agg on
    the returned net must reproduce the in-loop eta/upmask of the plain call
    (the frontend's deferred-upmask trick, state/graph.py final_upmask)."""
    params = nets.init_params(jax.random.PRNGKey(2))
    E, h, w = 4, 8, 8
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    corr = jnp.asarray(rng.normal(size=(E, h, w, 196)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(E, h, w, 4)).astype(np.float32))
    ii = jnp.asarray([0, 1, 1, 2])

    net_a, d_a, w_a, eta_a, up_a = nets.update_module(
        params, net, inp, corr, flow, ii=ii, num_frames=3)

    pre = nets.gru_context_pre(params, inp)
    net_b, d_b, w_b, eta_b, up_b = nets.update_module(
        params, net, inp, corr, flow, ii=ii, num_frames=3, pre=pre,
        compute_upmask=False)
    assert up_b is None
    np.testing.assert_allclose(np.asarray(net_b), np.asarray(net_a),
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_a),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(w_b), np.asarray(w_a),
                               atol=5e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(eta_b), np.asarray(eta_a),
                               atol=5e-6, rtol=1e-4)
    eta_c, up_c = nets.graph_agg(params, net_b, ii, 3)
    np.testing.assert_allclose(np.asarray(up_c), np.asarray(up_a),
                               atol=5e-5, rtol=1e-4)


def test_update_module_channel_major_corr(rng):
    """Channel-major corr [E,C,HW] (lookup_impl 'dense_cm', state/graph.py)
    matches the NHWC corr path to matmul-rounding tolerance."""
    params = nets.init_params(jax.random.PRNGKey(0))
    E, h, w = 3, 8, 8
    net = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    inp = jnp.asarray(rng.normal(size=(E, h, w, 128)).astype(np.float32))
    corr = jnp.asarray(rng.normal(size=(E, h, w, 196)).astype(np.float32))
    flow = jnp.asarray(rng.normal(size=(E, h, w, 4)).astype(np.float32))
    ii = jnp.asarray([0, 0, 1])

    a = nets.update_module(params, net, inp, corr, flow, ii=ii, num_frames=2)
    corr_cm = corr.reshape(E, h * w, 196).transpose(0, 2, 1)
    b = nets.update_module(params, net, inp, corr_cm, flow, ii=ii,
                           num_frames=2)
    for x, y, nm in zip(a, b, ["net", "delta", "weight", "eta", "upmask"]):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-5,
                                   rtol=1e-4, err_msg=nm)
