"""Pure-torch stand-ins for the reference's native dependencies so its
train-time forward (droid_net.py:172-222 + geom/ba.py) runs on CPU here.

The reference depends on three native libraries that are not in this
environment: lietorch (SE3 CUDA Lie groups, declared as an empty submodule),
torch_scatter (CUDA scatter ops), and droid_backends (the repo's CUDA
extension). Each shim reproduces the exact documented semantics:

  * SE3: 7-float [tx,ty,tz,qx,qy,qz,qw] storage, action on homogeneous
    points Y = R X[:3] + w t, left retraction exp(xi) o g, adjoint-transpose
    Ad(g)^T — the same math as the reference's own device kernels
    (/root/reference/src/droid_kernels.cu:67-184) and as
    droid_slam_tpu/lie/se3.py (validated against closed forms).
  * scatter_sum / scatter_mean via torch.index_add_.
  * corr_index_forward: python port of the bilinear window gather
    (/root/reference/src/correlation_kernels.cu:21-71).

install() registers them in sys.modules; it must run before importing any
reference module.
"""

import sys
import types

import torch


# ---------------------------------------------------------------------------
# SE3
# ---------------------------------------------------------------------------

def _qmul(q1, q2):
    x1, y1, z1, w1 = q1.unbind(-1)
    x2, y2, z2, w2 = q2.unbind(-1)
    return torch.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
        w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], dim=-1)


def _qinv(q):
    return q * torch.tensor([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def _qrot(q, v):
    qv = q[..., :3]
    w = q[..., 3:4]
    uv = 2.0 * torch.cross(qv.expand_as(v), v, dim=-1)
    return v + w * uv + torch.cross(qv.expand_as(uv), uv, dim=-1)


def _mul(a, b):
    t = _qrot(a[..., 3:7], b[..., :3]) + a[..., :3]
    q = _qmul(a[..., 3:7], b[..., 3:7])
    return torch.cat([t, q], dim=-1)


def _inv(g):
    qi = _qinv(g[..., 3:7])
    t = -_qrot(qi, g[..., :3])
    return torch.cat([t, qi], dim=-1)


def _so3_exp(phi):
    theta_sq = (phi * phi).sum(-1, keepdim=True)
    theta = torch.sqrt(theta_sq)
    small = theta_sq < 1e-8
    safe = torch.where(small, torch.ones_like(theta), theta)
    imag = torch.where(small, 0.5 - theta_sq / 48.0,
                       torch.sin(0.5 * safe) / safe)
    real = torch.where(small, 1.0 - theta_sq / 8.0, torch.cos(0.5 * safe))
    return torch.cat([imag * phi, real], dim=-1)


def _se3_exp(xi):
    tau, phi = xi[..., :3], xi[..., 3:6]
    q = _so3_exp(phi)
    theta_sq = (phi * phi).sum(-1, keepdim=True)
    small = theta_sq < 1e-8
    safe_sq = torch.where(small, torch.ones_like(theta_sq), theta_sq)
    safe = torch.sqrt(safe_sq)
    a = torch.where(small, 0.5 - theta_sq / 24.0,
                    (1.0 - torch.cos(safe)) / safe_sq)
    b = torch.where(small, 1.0 / 6.0 - theta_sq / 120.0,
                    (safe - torch.sin(safe)) / (safe * safe_sq))
    pxt = torch.cross(phi.expand_as(tau), tau, dim=-1)
    t = tau + a * pxt + b * torch.cross(phi.expand_as(pxt), pxt, dim=-1)
    return torch.cat([t, q], dim=-1)


class SE3:
    manifold_dim = 6

    def __init__(self, data):
        self.data = data

    def __getitem__(self, idx):
        return SE3(self.data[idx])

    def inv(self):
        return SE3(_inv(self.data))

    def __mul__(self, other):
        if isinstance(other, SE3):
            return SE3(_mul(self.data, other.data))
        # action on homogeneous points [..., 4]
        X = other
        y = _qrot(self.data[..., 3:7], X[..., :3]) \
            + X[..., 3:4] * self.data[..., :3]
        return torch.cat([y, X[..., 3:4].expand_as(y[..., :1])], dim=-1)

    def retr(self, xi):
        return SE3(_mul(_se3_exp(xi), self.data))

    def adjT(self, a):
        qinv = _qinv(self.data[..., 3:7])
        av, aw = a[..., :3], a[..., 3:6]
        t = self.data[..., :3]
        out_v = _qrot(qinv, av)
        out_w = _qrot(qinv, aw) + _qrot(
            qinv, torch.cross(av, t.expand_as(av), dim=-1))
        return torch.cat([out_v, out_w], dim=-1)

    def detach(self):
        return SE3(self.data.detach())

    @property
    def shape(self):
        return self.data.shape[:-1]


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------

def scatter_sum(src, index, dim=0, dim_size=None):
    if dim < 0:
        dim = src.dim() + dim
    n = dim_size if dim_size is not None else int(index.max()) + 1
    shape = list(src.shape)
    shape[dim] = n
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    return out.index_add_(dim, index.long(), src)


def scatter_mean(src, index, dim=0, dim_size=None):
    s = scatter_sum(src, index, dim, dim_size)
    ones = torch.ones(src.shape[dim], dtype=src.dtype, device=src.device)
    cnt = torch.zeros(s.shape[dim], dtype=src.dtype,
                      device=src.device).index_add_(0, index.long(), ones)
    cnt = cnt.clamp(min=1.0)
    view = [1] * s.dim()
    view[dim] = -1
    return s / cnt.view(view)


# ---------------------------------------------------------------------------
# droid_backends.corr_index_forward (correlation_kernels.cu:21-71)
# ---------------------------------------------------------------------------

def corr_index_forward(volume, coords, r):
    BN, h1, w1, h2, w2 = volume.shape
    x0 = coords[:, 0]
    y0 = coords[:, 1]
    dx = (x0 - torch.floor(x0))
    dy = (y0 - torch.floor(y0))
    xi0 = torch.floor(x0).long()
    yi0 = torch.floor(y0).long()
    rd = 2 * r + 1

    volf = volume.reshape(BN, h1 * w1, h2 * w2)
    bidx = torch.arange(BN)[:, None]
    pidx = torch.arange(h1 * w1)[None, :]

    corr = torch.zeros(BN, rd, rd, h1, w1, dtype=volume.dtype)
    for i in range(rd + 1):
        for j in range(rd + 1):
            x1 = xi0 - r + i
            y1 = yi0 - r + j
            inb = ((x1 >= 0) & (x1 < w2) & (y1 >= 0) & (y1 < h2)).float()
            idx = (y1.clamp(0, h2 - 1) * w2 + x1.clamp(0, w2 - 1))
            s = (volf[bidx, pidx, idx.reshape(BN, -1)]
                 .reshape(BN, h1, w1) * inb)
            if i > 0 and j > 0:
                corr[:, i - 1, j - 1] += s * (dx * dy)
            if i > 0 and j < rd:
                corr[:, i - 1, j] += s * (dx * (1.0 - dy))
            if i < rd and j > 0:
                corr[:, i, j - 1] += s * ((1.0 - dx) * dy)
            if i < rd and j < rd:
                corr[:, i, j] += s * ((1.0 - dx) * (1.0 - dy))
    return (corr.reshape(BN, rd * rd, h1, w1),)


# ---------------------------------------------------------------------------


def install():
    """Register the shims and make `device="cuda"` tensor creation fall back
    to CPU (projective_ops.py:176-178 hardcodes cuda)."""
    lt = types.ModuleType("lietorch")
    lt.SE3 = SE3
    lt.Sim3 = type("Sim3", (), {})  # isinstance checks only
    sys.modules.setdefault("lietorch", lt)

    ts = types.ModuleType("torch_scatter")
    ts.scatter_sum = scatter_sum
    ts.scatter_mean = scatter_mean
    sys.modules.setdefault("torch_scatter", ts)

    db = types.ModuleType("droid_backends")
    db.corr_index_forward = corr_index_forward
    sys.modules.setdefault("droid_backends", db)

    if not torch.cuda.is_available():
        orig = torch.as_tensor

        def as_tensor_cpu(data, *args, **kwargs):
            if kwargs.get("device") == "cuda":
                kwargs["device"] = "cpu"
            return orig(data, *args, **kwargs)

        if getattr(torch.as_tensor, "__name__", "") != "as_tensor_cpu":
            torch.as_tensor = as_tensor_cpu

        # reference code calls .cuda() unconditionally in places
        # (e.g. rgbd_utils.py:117-118) — make it a no-op on CPU-only torch
        if getattr(torch.Tensor.cuda, "__name__", "") != "cuda_noop":
            def cuda_noop(self, *args, **kwargs):
                return self
            torch.Tensor.cuda = cuda_noop
