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


def _so3_log(q):
    qv = q[..., :3]
    w = q[..., 3:4]
    n = qv.norm(dim=-1, keepdim=True)
    theta = 2.0 * torch.atan2(n, w)
    small = n < 1e-8
    scale = torch.where(small, 2.0 / w.clamp(min=1e-8),
                        theta / n.clamp(min=1e-12))
    return scale * qv


def _skew(v):
    o = torch.zeros_like(v[..., 0])
    return torch.stack([
        o, -v[..., 2], v[..., 1],
        v[..., 2], o, -v[..., 0],
        -v[..., 1], v[..., 0], o], dim=-1).reshape(v.shape[:-1] + (3, 3))


def _se3_log(g):
    phi = _so3_log(g[..., 3:7])
    t = g[..., :3]
    theta_sq = (phi * phi).sum(-1, keepdim=True)
    theta = torch.sqrt(theta_sq.clamp(min=1e-24))
    small = theta_sq < 1e-8
    # V^{-1} = I - 1/2 S + c S^2,  c = 1/th^2 - (1+cos th)/(2 th sin th)
    denom = (2.0 * theta * torch.sin(theta))
    denom = torch.where(small, torch.ones_like(denom), denom)
    c = torch.where(
        small, 1.0 / 12.0 + theta_sq / 720.0,
        1.0 / theta_sq.clamp(min=1e-24) - (1.0 + torch.cos(theta)) / denom)
    S = _skew(phi)
    I = torch.eye(3, dtype=g.dtype).expand(S.shape)
    Vinv = I - 0.5 * S + c[..., None] * (S @ S)
    tau = (Vinv @ t[..., None]).squeeze(-1)
    return torch.cat([tau, phi], dim=-1)


class SE3:
    manifold_dim = 6

    def __init__(self, data):
        self.data = data

    def __getitem__(self, idx):
        return SE3(self.data[idx])

    @staticmethod
    def Identity(*shape, **kw):
        d = torch.zeros(tuple(shape) + (7,), dtype=torch.float32)
        d[..., 6] = 1.0
        return SE3(d)

    @staticmethod
    def exp(xi):
        return SE3(_se3_exp(xi))

    def log(self):
        return _se3_log(self.data)

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
# droid_backends.frame_distance (droid_kernels.cu:527-666)
# ---------------------------------------------------------------------------

_BA_MIN_DEPTH = 0.25  # droid_kernels.cu:35
_STEREO_GIJ = torch.tensor([-0.1, 0, 0, 0, 0, 0, 1.0])


def _pixel_grid(ht, wd):
    y, x = torch.meshgrid(torch.arange(ht, dtype=torch.float32),
                          torch.arange(wd, dtype=torch.float32),
                          indexing="ij")
    return x, y


def frame_distance(poses, disps, intrinsics, ii, jj, beta):
    """Mean induced-flow magnitude between frame pairs: beta-blend of the
    full-SE3 flow and the translation-only flow, each term valid-gated at
    z > 0.25; returns 1000.0 when <75% of terms are valid. One direction only
    (depth_video.py:195-201 averages both directions on the host)."""
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = [float(intrinsics[k]) for k in range(4)]
    x, y = _pixel_grid(ht, wd)
    ii_l, jj_l = ii.long(), jj.long()
    Gij = _mul(poses[jj_l], _inv(poses[ii_l]))  # [E,7]
    di = disps[ii_l]  # [E,ht,wd]
    Xx = ((x - cx) / fx).expand_as(di)
    Xy = ((y - cy) / fy).expand_as(di)
    X3 = torch.stack([Xx, Xy, torch.ones_like(di)], dim=-1)

    q = Gij[:, None, None, 3:7]
    t = Gij[:, None, None, :3]

    def flow_terms(Y):
        z = Y[..., 2]
        val = (z > _BA_MIN_DEPTH).float()
        zs = torch.where(z > _BA_MIN_DEPTH, z, torch.ones_like(z))
        du = fx * (Y[..., 0] / zs) + cx - x
        dv = fy * (Y[..., 1] / zs) + cy - y
        return torch.sqrt(du * du + dv * dv), val

    d1, v1 = flow_terms(_qrot(q, X3) + di[..., None] * t)
    d2, v2 = flow_terms(X3 + di[..., None] * t)
    accum = (beta * (d1 * v1) + (1 - beta) * (d2 * v2)).sum((-2, -1))
    valid = (beta * v1 + (1 - beta) * v2).sum((-2, -1))
    total = float(ht * wd)
    frac = valid / (total + 1e-8)
    return torch.where(frac < 0.75, torch.full_like(accum, 1000.0),
                       accum / valid.clamp(min=1e-12))


# ---------------------------------------------------------------------------
# droid_backends.ba (ba_cuda, droid_kernels.cu:1323-1443) — dense torch
# reimplementation with the pose solve in float64 (the reference solves with
# Eigen's double SimplicialLLT on the CPU, :1201-1222). In-place on
# poses/disps like the kernels.
# ---------------------------------------------------------------------------

def _ba_linearize(poses, disps, intrinsics, targets, weights, ii_l, jj_l):
    """projective_transform_kernel (droid_kernels.cu:185-433), vectorized.

    Returns r [E,2,ht,wd], w_pose/w_depth, Ji/Jj [E,ht,wd,2,6], Jz [E,ht,wd,2].
    w_pose is stereo-zeroed (:332,365); depth diag/rhs keep the weight."""
    ht, wd = disps.shape[-2:]
    fx, fy, cx, cy = [float(intrinsics[k]) for k in range(4)]
    x, y = _pixel_grid(ht, wd)
    stereo = (ii_l == jj_l)
    Gij = _mul(poses[jj_l], _inv(poses[ii_l]))
    Gij = torch.where(stereo[:, None], _STEREO_GIJ, Gij)
    di = disps[ii_l]
    X3 = torch.stack([((x - cx) / fx).expand_as(di),
                      ((y - cy) / fy).expand_as(di),
                      torch.ones_like(di)], dim=-1)
    q = Gij[:, None, None, 3:7]
    t = Gij[:, None, None, :3]
    Y = _qrot(q, X3) + di[..., None] * t  # [E,ht,wd,3]
    Xj_x, Xj_y, z = Y[..., 0], Y[..., 1], Y[..., 2]
    h = di  # homogeneous coordinate rides along unchanged

    behind = z < _BA_MIN_DEPTH
    d = torch.where(behind, torch.zeros_like(z), 1.0 / z)
    d2 = d * d
    wu = torch.where(behind, torch.zeros_like(z), 0.001 * weights[:, 0])
    wv = torch.where(behind, torch.zeros_like(z), 0.001 * weights[:, 1])
    ru = targets[:, 0] - (fx * d * Xj_x + cx)
    rv = targets[:, 1] - (fy * d * Xj_y + cy)

    o = torch.zeros_like(d)
    Jj_u = torch.stack([fx * h * d, o, -fx * Xj_x * h * d2,
                        -fx * Xj_x * Xj_y * d2, fx * (1 + Xj_x * Xj_x * d2),
                        -fx * Xj_y * d], dim=-1)
    Jj_v = torch.stack([o, fy * h * d, -fy * Xj_y * h * d2,
                        -fy * (1 + Xj_y * Xj_y * d2), fy * Xj_x * Xj_y * d2,
                        fy * Xj_x * d], dim=-1)
    Jj = torch.stack([Jj_u, Jj_v], dim=-2)  # [E,ht,wd,2,6]
    # Ji = -adjSE3(Gij)^T applied per covector row (droid_kernels.cu:334-336)
    g_full = Gij[:, None, None, None, :].expand(Jj.shape[:-1] + (7,))
    Ji = -SE3(g_full).adjT(Jj)

    tij = Gij[:, None, None, :3]
    Jz_u = fx * (tij[..., 0] * d - tij[..., 2] * Xj_x * d2)
    Jz_v = fy * (tij[..., 1] * d - tij[..., 2] * Xj_y * d2)
    Jz = torch.stack([Jz_u, Jz_v], dim=-1)  # [E,ht,wd,2]

    r = torch.stack([ru, rv], dim=1)            # [E,2,ht,wd]
    w_depth = torch.stack([wu, wv], dim=1)
    w_pose = torch.where(stereo[:, None, None, None],
                         torch.zeros_like(w_depth), w_depth)
    return r, w_pose, w_depth, Ji, Jj, Jz


def ba(poses, disps, intrinsics, disps_sens, targets, weights, eta, ii, jj,
       t0, t1, iterations, lm, ep, motion_only):
    alpha = 0.05
    E = int(ii.shape[0])
    ht, wd = disps.shape[-2:]
    hw = ht * wd
    ii_l, jj_l = ii.long(), jj.long()
    ts = torch.arange(t0, t1, dtype=torch.long)
    ii_exp = torch.cat([ts, ii_l])
    jj_exp = torch.cat([ts, jj_l])
    kx, kk_exp = torch.unique(ii_exp, return_inverse=True)
    M = int(kx.shape[0])
    P = t1 - t0
    eta_flat = eta.reshape(-1, hw)
    assert eta_flat.shape[0] == M, (eta_flat.shape, M)

    for _ in range(iterations):
        r, w_pose, w_depth, Ji, Jj, Jz = _ba_linearize(
            poses, disps, intrinsics, targets, weights, ii_l, jj_l)
        rf = r.permute(0, 2, 3, 1).reshape(E, hw, 2)      # [E,hw,2]
        wp = w_pose.permute(0, 2, 3, 1).reshape(E, hw, 2)
        wdep = w_depth.permute(0, 2, 3, 1).reshape(E, hw, 2)
        Jif = Ji.reshape(E, hw, 2, 6)
        Jjf = Jj.reshape(E, hw, 2, 6)
        Jzf = Jz.reshape(E, hw, 2)

        def blocks(Ja, Jb):
            return torch.einsum("ehc,ehcd,ehcf->edf", wp, Ja, Jb)

        Hii, Hij = blocks(Jif, Jif), blocks(Jif, Jjf)
        Hji, Hjj = blocks(Jjf, Jif), blocks(Jjf, Jjf)
        vi = torch.einsum("ehc,ehcd,ehc->ed", wp, Jif, rf)
        vj = torch.einsum("ehc,ehcd,ehc->ed", wp, Jjf, rf)

        # dense pose system over the free window [t0, t1)
        A = torch.zeros(P, P, 6, 6, dtype=torch.float64)
        v = torch.zeros(P, 6, dtype=torch.float64)
        bi, bj = ii_l - t0, jj_l - t0
        for e in range(E):
            a, b = int(bi[e]), int(bj[e])
            if a >= 0:
                A[a, a] += Hii[e].double()
                v[a] += vi[e].double()
            if a >= 0 and b >= 0:
                A[a, b] += Hij[e].double()
                A[b, a] += Hji[e].double()
            if b >= 0:
                A[b, b] += Hjj[e].double()
                v[b] += vj[e].double()

        if not motion_only:
            # depth terms: Eii/Eij rows, C diag, bz rhs
            Eii_e = torch.einsum("ehc,ehcd,ehc->edh", wp, Jif, Jzf)
            Eij_e = torch.einsum("ehc,ehcd,ehc->edh", wp, Jjf, Jzf)
            Cii_e = torch.einsum("ehc,ehc,ehc->eh", wdep, Jzf, Jzf)
            bz_e = torch.einsum("ehc,ehc,ehc->eh", wdep, rf, Jzf)

            # Ei rows accumulated by source frame onto window frames only
            # (accum_cuda(Eii, ii, ts) — sources < t0 drop, cu:1414)
            Ei_win = torch.zeros(P, 6, hw, dtype=torch.float32)
            for e in range(E):
                a = int(ii_l[e]) - t0
                if 0 <= a < P:
                    Ei_win[a] += Eii_e[e]
            Erows = torch.cat([Ei_win, Eij_e], dim=0)     # [P+E,6,hw]
            row_pose = (jj_exp - t0)                       # [P+E]
            row_kk = kk_exp

            # C/w over depth frames kx
            C = torch.zeros(M, hw)
            wz = torch.zeros(M, hw)
            kk_edges = kk_exp[P:]
            for e in range(E):
                k = int(kk_edges[e])
                C[k] += Cii_e[e]
                wz[k] += bz_e[e]
            m = (disps_sens[kx].reshape(M, hw) > 0).float()
            C = C + m * alpha + (1 - m) * eta_flat
            wz = wz - m * alpha * (disps[kx].reshape(M, hw)
                                   - disps_sens[kx].reshape(M, hw))
            Q = 1.0 / C

            # Schur: S[a,b] += E_ra Q_k E_rb^T over rows sharing depth k
            S = torch.zeros(P, P, 6, 6, dtype=torch.float64)
            v_s = torch.zeros(P, 6, dtype=torch.float64)
            rows_by_k = [[] for _ in range(M)]
            for rr in range(P + E):
                pj = int(row_pose[rr])
                if t0 <= int(jj_exp[rr]) <= t1:  # schur_block gate, cu:1269
                    rows_by_k[int(row_kk[rr])].append(rr)
            for k in range(M):
                rows = rows_by_k[k]
                if not rows:
                    continue
                Ek = Erows[rows]                           # [R,6,hw]
                EQ = Ek * Q[k][None, None, :]
                G = torch.einsum("rdh,sfh->rsdf", EQ.double(), Ek.double())
                for ai, ra in enumerate(rows):
                    pa = int(row_pose[ra])
                    if not (0 <= pa < P):
                        continue
                    v_s[pa] += (Ek[ai].double()
                                @ (Q[k] * wz[k]).double())
                    for bi2, rb in enumerate(rows):
                        pb = int(row_pose[rb])
                        if 0 <= pb < P:
                            S[pa, pb] += G[ai, bi2]

            A = A - S
            v = v - v_s

        # damped fp64 solve (SparseBlock::solve, cu:1201-1222)
        Ad = A.permute(0, 2, 1, 3).reshape(P * 6, P * 6).clone()
        diag = torch.arange(P * 6)
        Ad[diag, diag] += ep + lm * Ad[diag, diag]
        try:
            L = torch.linalg.cholesky(Ad)
            dx = torch.cholesky_solve(v.reshape(P * 6, 1), L).reshape(P, 6)
        except Exception:
            dx = torch.zeros(P, 6, dtype=torch.float64)
        dx = dx.float()

        # pose retraction over [t0, t1)
        poses[t0:t1] = _mul(_se3_exp(dx), poses[t0:t1])

        if not motion_only:
            # dz = Q (w - accum(E^T dx)) — EvT6x1 skips pose index <= 0
            # (cu:1116-1117, a reference quirk kept for exactness)
            acc = torch.zeros(M, hw)
            for rr in range(P + E):
                px = int(row_pose[rr])
                if px <= 0 or px >= P:
                    continue
                acc[int(row_kk[rr])] += torch.einsum(
                    "dh,d->h", Erows[rr], dx[px])
            dz = Q * (wz - acc)
            disps[kx] = disps[kx] + dz.reshape(M, ht, wd)

    return None


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
    db.frame_distance = frame_distance
    db.ba = ba
    sys.modules.setdefault("droid_backends", db)

    if not torch.cuda.is_available():
        def _is_cuda(dev):
            return isinstance(dev, str) and dev.startswith("cuda")

        def _wrap_factory(fn):
            def wrapper(*args, **kwargs):
                if _is_cuda(kwargs.get("device")):
                    kwargs["device"] = "cpu"
                return fn(*args, **kwargs)
            wrapper.__name__ = "cpu_fallback"
            return wrapper

        # the reference hardcodes device="cuda" in several constructors
        # (factor_graph.py:32-50, projective_ops.py:15) — fall back to CPU
        for name in ("as_tensor", "arange", "zeros", "ones", "tensor",
                     "empty", "full", "meshgrid", "linspace"):
            fn = getattr(torch, name)
            if getattr(fn, "__name__", "") != "cpu_fallback":
                setattr(torch, name, _wrap_factory(fn))

        # reference code calls .cuda() / .to("cuda") unconditionally in
        # places (rgbd_utils.py:117-118, factor_graph.py:125-135)
        if getattr(torch.Tensor.cuda, "__name__", "") != "cuda_noop":
            def cuda_noop(self, *args, **kwargs):
                return self
            torch.Tensor.cuda = cuda_noop

        if getattr(torch.Tensor.to, "__name__", "") != "to_cpu_fallback":
            orig_to = torch.Tensor.to

            def to_cpu_fallback(self, *args, **kwargs):
                args = tuple("cpu" if _is_cuda(a) else a for a in args)
                if _is_cuda(kwargs.get("device")):
                    kwargs["device"] = "cpu"
                return orig_to(self, *args, **kwargs)
            torch.Tensor.to = to_cpu_fallback
