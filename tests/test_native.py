"""Native host-runtime parity: C++ plan builder / NMS proposer vs the python
references."""

import numpy as np
import pytest

from droid_slam_tpu import native


requires_native = pytest.mark.skipif(native.get_lib() is None,
                                     reason="g++ unavailable")


@requires_native
def test_build_ba_rows_matches_python(rng):
    for trial in range(5):
        t1 = int(rng.integers(6, 20))
        t0 = int(rng.integers(1, t1 - 2))
        n_edges = int(rng.integers(4, 40))
        ii = rng.integers(max(t0 - 3, 0), t1, size=n_edges)
        jj = rng.integers(max(t0 - 3, 0), t1, size=n_edges)
        g0 = int(min(ii.min(), jj.min(), t0))
        NW, E = 32, 64

        res = native.build_ba_rows(ii, jj, t0, t1, g0, NW, E, 128)
        assert res is not None
        row_pose, row_depth, k_valid, rk_idx, rmax = res

        # python reference
        kx = set(range(t0, t1)) | set(int(x) for x in ii)
        kv = np.zeros(NW, bool)
        for k in kx:
            if g0 <= k < g0 + NW:
                kv[k - g0] = True
        np.testing.assert_array_equal(k_valid, kv)

        rp = np.full(NW + E, -1, np.int32)
        rd = np.zeros(NW + E, np.int32)
        for r in range(NW):
            f = g0 + r
            rd[r] = r
            if t0 <= f < t1:
                rp[r] = f - t0
        for e in range(n_edges):
            rd[NW + e] = ii[e] - g0
            if t0 <= jj[e] < t1:
                rp[NW + e] = jj[e] - t0
        np.testing.assert_array_equal(row_pose, rp)
        np.testing.assert_array_equal(row_depth, rd)

        groups = [[] for _ in range(NW)]
        for r in range(NW + n_edges):
            if rp[r] >= 0:
                groups[rd[r]].append(r)
        for k, g in enumerate(groups):
            np.testing.assert_array_equal(rk_idx[k, :len(g)], g)
            assert np.all(rk_idx[k, len(g):] == -1)


@requires_native
def test_proximity_edges_matches_python(rng):
    """The native greedy NMS proposer must produce the same edge sequence as
    the reference python loop (factor_graph.py:346-412)."""
    t, t0, t1 = 14, 2, 0
    rad, nms, thresh, max_factors = 2, 2, 16.0, 48

    rows, cols = t - t0, t - t1
    d0 = rng.uniform(0, 40, size=(rows * cols,)).astype(np.float64)
    ii_exist = np.array([3, 4], np.int64)
    jj_exist = np.array([5, 2], np.int64)

    es_native = native.proximity_edges(d0.copy(), t0, t1, t, rad, nms,
                                       thresh, max_factors, False,
                                       ii_exist, jj_exist)

    # python reference
    d = d0.copy()
    ii, jj = np.meshgrid(np.arange(t0, t), np.arange(t1, t), indexing="ij")
    ii, jj = ii.reshape(-1), jj.reshape(-1)
    d[ii - rad < jj] = np.inf
    d[d > 100] = np.inf

    def suppress(i, j):
        n = max(min(abs(i - j) - 2, nms), 0)
        for di in range(-nms, nms + 1):
            for dj in range(-nms, nms + 1):
                if abs(di) + abs(dj) <= n:
                    i1, j1 = i + di, j + dj
                    if t0 <= i1 < t and t1 <= j1 < t:
                        d[(i1 - t0) * cols + (j1 - t1)] = np.inf

    for i, j in zip(ii_exist, jj_exist):
        suppress(int(i), int(j))

    es = []
    for i in range(t0, t):
        for j in range(max(i - rad - 1, 0), i):
            es.append((i, j))
            es.append((j, i))
            if t1 <= j < t:
                d[(i - t0) * cols + (j - t1)] = np.inf

    for k in np.argsort(d, kind="stable"):
        if d[k] > thresh:
            continue
        if max_factors > 0 and len(es) > max_factors:
            break
        i, j = int(ii[k]), int(jj[k])
        es.append((i, j))
        es.append((j, i))
        suppress(i, j)

    np.testing.assert_array_equal(es_native, np.asarray(es))
