"""Round-trip the droid.pth import path end-to-end.

Builds a reference-shaped torch checkpoint exactly like the released
droid.pth (random reference DroidNet state_dict, heads EXPANDED to 3
output channels, ``module.`` DDP prefixes, saved with torch.save), loads
it through models/weights.load, and asserts:

  1. byte-for-byte: the imported params equal the reference's own
     post-surgery state (prefix strip + 3->2 head slice, droid.py:45-59,
     + OIHW->HWIO transpose),
  2. the full forward with the imported params matches the reference
     torch forward running the same checkpoint.

This makes the importer trustworthy for the day the real droid.pth lands
(no egress here).
"""

import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF = "/root/reference/droid_slam"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


def _reference_shaped_checkpoint(net_t, torch):
    """state_dict -> what the released droid.pth looks like: module.
    prefixes and 3-channel weight/delta heads (droid.py:50-56)."""
    gen = torch.Generator().manual_seed(123)
    ckpt = {}
    for k, v in net_t.state_dict().items():
        ckpt["module." + k] = v.clone()
    for head in ("update.weight.2", "update.delta.2"):
        w = ckpt["module." + head + ".weight"]
        b = ckpt["module." + head + ".bias"]
        extra_w = torch.randn(w[:1].shape, generator=gen)
        extra_b = torch.randn(b[:1].shape, generator=gen)
        ckpt["module." + head + ".weight"] = torch.cat([w, extra_w], dim=0)
        ckpt["module." + head + ".bias"] = torch.cat([b, extra_b], dim=0)
    return ckpt


def test_droid_pth_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import ref_shims
    ref_shims.install()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from droid_net import DroidNet          # noqa: reference module
    from lietorch import SE3                # noqa: the shim
    from test_golden_forward import _torch_state_to_params

    from droid_slam_tpu.lie import se3
    from droid_slam_tpu.models import droidnet
    from droid_slam_tpu.models import weights as weights_io

    torch.manual_seed(11)
    net_t = DroidNet().eval()

    pth = str(tmp_path / "droid.pth")
    torch.save(_reference_shaped_checkpoint(net_t, torch), pth)

    params = weights_io.load(pth)

    # --- 1. byte-for-byte vs the reference's own post-surgery weights ----
    expected = _torch_state_to_params(net_t.state_dict())
    assert set(params) == set(expected)
    for k in expected:
        assert params[k].dtype == expected[k].dtype, k
        assert np.array_equal(np.asarray(params[k]),
                              np.asarray(expected[k])), k

    # --- 2. full forward parity with the same checkpoint ------------------
    rng = np.random.default_rng(5)
    # h=w=16 so all 4 reference pyramid levels survive its trailing
    # avg_pool (same constraint as test_golden_forward)
    N, H, W = 4, 128, 128
    h, w = H // 8, W // 8
    images = rng.integers(0, 255, size=(N, H, W, 3)).astype(np.uint8)
    xi = (0.02 * rng.normal(size=(N, 6))).astype(np.float32)
    Gs0 = np.asarray(se3.exp(jnp.asarray(xi)))
    disps0 = (1.0 + 0.1 * rng.random(size=(N, h, w))).astype(np.float32)
    intr = np.tile(np.array([24.0, 24.0, w / 2, h / 2], np.float32), (N, 1))
    graph = {i: [j for j in range(N) if 0 < abs(i - j) <= 2]
             for i in range(N)}
    ii = np.array([u for u in graph for _ in graph[u]])
    jj = np.array([v for u in graph for v in graph[u]])

    imgs_t = torch.from_numpy(
        images.transpose(0, 3, 1, 2)[None].astype(np.float32))
    with torch.no_grad():
        Gs_list_t, _, _ = net_t.forward(
            SE3(torch.from_numpy(Gs0[None].copy())), imgs_t,
            torch.from_numpy(disps0[None].copy()),
            torch.from_numpy(intr[None].copy()),
            graph=graph, num_steps=1, fixedp=2)

    Gs_list, _, _ = droidnet.forward(
        params, jnp.asarray(images), jnp.asarray(Gs0), jnp.asarray(disps0),
        jnp.asarray(intr), jnp.asarray(ii), jnp.asarray(jj),
        num_steps=1, fixedp=2, compute_dtype=jnp.float32)

    ref_pose = Gs_list_t[0].data.numpy()[0]
    our_pose = np.asarray(Gs_list[0])
    diff = np.asarray(se3.log(se3.mul(se3.inv(jnp.asarray(ref_pose)),
                                      jnp.asarray(our_pose))))
    assert np.abs(diff).max() < 2e-3, np.abs(diff).max()
