"""Full-step cross-implementation golden test.

Runs the REFERENCE train-time forward (droid_net.py:172-222: feature
extraction -> correlation pyramid -> N x (corr lookup -> UpdateModule ->
2 x differentiable BA -> reproject)) on CPU torch with its native deps
shimmed (tests/ref_shims.py), and our jittable forward
(droid_slam_tpu/models/droidnet.py) with IDENTICAL weights and inputs, then
compares poses, upsampled disparities and residuals — the strongest
end-to-end numerical-parity check available without trained weights or GPU.
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = "/root/reference/droid_slam"
HAS_REF = os.path.isdir(REF)


def _torch_state_to_params(state):
    import torch  # noqa
    params = {}
    for k, v in state.items():
        arr = v.detach().numpy()
        if arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
        params[k] = jnp.asarray(arr)
    return params


@pytest.mark.skipif(not HAS_REF, reason="reference checkout not available")
def test_full_forward_matches_reference():
    import torch
    import ref_shims
    ref_shims.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from droid_net import DroidNet          # noqa: reference module
    from lietorch import SE3                # noqa: the shim

    from droid_slam_tpu.models import droidnet
    from droid_slam_tpu.lie import se3

    torch.manual_seed(7)
    rng = np.random.default_rng(7)

    # h=w=16: all 4 pyramid levels (16,8,4,2) survive the reference's extra
    # trailing avg_pool after the last level
    N, H, W = 5, 128, 128
    h, w = H // 8, W // 8

    net_t = DroidNet().eval()
    params = _torch_state_to_params(net_t.state_dict())

    images = rng.integers(0, 255, size=(N, H, W, 3)).astype(np.uint8)
    xi = (0.02 * rng.normal(size=(N, 6))).astype(np.float32)
    Gs0 = np.asarray(se3.exp(jnp.asarray(xi)))
    disps0 = (1.0 + 0.1 * rng.random(size=(N, h, w))).astype(np.float32)
    intr = np.tile(np.array([24.0, 24.0, w / 2, h / 2], np.float32), (N, 1))

    # covisibility graph: +/- 2 neighborhood, every frame a source
    graph = {i: [j for j in range(N) if 0 < abs(i - j) <= 2]
             for i in range(N)}
    ii = np.array([u for u in graph for _ in graph[u]])
    jj = np.array([v for u in graph for v in graph[u]])

    num_steps = 2

    # ---- reference forward (CPU torch + shims) ---------------------------
    imgs_t = torch.from_numpy(
        images.transpose(0, 3, 1, 2)[None].astype(np.float32))
    with torch.no_grad():
        Gs_list_t, disp_list_t, res_list_t = net_t.forward(
            SE3(torch.from_numpy(Gs0[None].copy())), imgs_t,
            torch.from_numpy(disps0[None].copy()),
            torch.from_numpy(intr[None].copy()),
            graph=graph, num_steps=num_steps, fixedp=2)

    # ---- our forward (f32 compute for apples-to-apples) ------------------
    Gs_list, disp_list, res_list = droidnet.forward(
        params, jnp.asarray(images), jnp.asarray(Gs0), jnp.asarray(disps0),
        jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj),
        num_steps=num_steps, fixedp=2, compute_dtype=jnp.float32)

    for step in range(num_steps):
        ref_pose = Gs_list_t[step].data.numpy()[0]
        our_pose = np.asarray(Gs_list[step])
        # compare as group elements (sign-free): || log(ref^-1 ours) ||
        diff = np.asarray(se3.log(se3.mul(se3.inv(jnp.asarray(ref_pose)),
                                          jnp.asarray(our_pose))))
        assert np.abs(diff).max() < 2e-3, (step, np.abs(diff).max())

        ref_disp = disp_list_t[step].numpy()[0]
        our_disp = np.asarray(disp_list[step])
        assert np.abs(ref_disp - our_disp).max() < 5e-3, \
            (step, np.abs(ref_disp - our_disp).max())

        ref_res = res_list_t[step].numpy()[0]
        our_res = np.asarray(res_list[step])
        assert np.abs(ref_res - our_res).max() < 5e-3, \
            (step, np.abs(ref_res - our_res).max())
