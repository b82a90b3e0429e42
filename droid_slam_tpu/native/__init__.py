"""Native host-side runtime (C++ via ctypes).

Builds lazily with g++ on first import; falls back to the pure-python
implementations in ba/inference.py and state/graph.py when no compiler is
available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "plan_builder.cpp")
_LIB = os.path.join(_DIR, "libdroidplan.so")

_lib = None


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib or None
    try:
        if (not os.path.exists(_LIB)
                or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_LIB)
        lib.build_ba_rows.restype = ctypes.c_int
        lib.build_ba_rows_masked.restype = ctypes.c_int
        lib.proximity_edges.restype = ctypes.c_int
        _lib = lib
        return lib
    except Exception:
        _lib = False
        return None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def build_ba_rows(ii, jj, t0, t1, g0, NW, E, rmax_cap):
    """Native Schur-row grouping; returns (row_pose, row_depth, k_valid,
    rk_idx, rmax) or None when the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n_edges = len(ii)
    ii = np.ascontiguousarray(ii, np.int64)
    jj = np.ascontiguousarray(jj, np.int64)
    row_pose = np.empty(NW + E, np.int32)
    row_depth = np.empty(NW + E, np.int32)
    k_valid = np.empty(NW, np.uint8)
    rk_idx = np.empty((NW, rmax_cap), np.int32)
    rmax = lib.build_ba_rows(
        _ptr(ii, ctypes.c_int64), _ptr(jj, ctypes.c_int64),
        ctypes.c_int(n_edges), ctypes.c_int(t0), ctypes.c_int(t1),
        ctypes.c_int(g0), ctypes.c_int(NW), ctypes.c_int(E),
        ctypes.c_int(rmax_cap), _ptr(row_pose, ctypes.c_int32),
        _ptr(row_depth, ctypes.c_int32), _ptr(k_valid, ctypes.c_uint8),
        _ptr(rk_idx, ctypes.c_int32))
    if rmax < 0:
        return None
    return row_pose, row_depth, k_valid.astype(bool), rk_idx, rmax


def build_ba_rows_masked(ii_p, jj_p, valid, t0, t1, g0, NW, E, rmax_cap):
    """Masked Schur-row grouping for padded edge layouts; None when the
    native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    ii_p = np.ascontiguousarray(ii_p, np.int32)
    jj_p = np.ascontiguousarray(jj_p, np.int32)
    valid = np.ascontiguousarray(valid, np.uint8)
    row_pose = np.empty(NW + E, np.int32)
    row_depth = np.empty(NW + E, np.int32)
    k_valid = np.empty(NW, np.uint8)
    rk_idx = np.empty((NW, rmax_cap), np.int32)
    rmax = lib.build_ba_rows_masked(
        _ptr(ii_p, ctypes.c_int32), _ptr(jj_p, ctypes.c_int32),
        _ptr(valid, ctypes.c_uint8), ctypes.c_int(t0), ctypes.c_int(t1),
        ctypes.c_int(g0), ctypes.c_int(NW), ctypes.c_int(E),
        ctypes.c_int(rmax_cap), _ptr(row_pose, ctypes.c_int32),
        _ptr(row_depth, ctypes.c_int32), _ptr(k_valid, ctypes.c_uint8),
        _ptr(rk_idx, ctypes.c_int32))
    if rmax < 0:
        return None
    return row_pose, row_depth, k_valid.astype(bool), rk_idx, rmax


def proximity_edges(d, t0, t1, t, rad, nms, thresh, max_factors, stereo,
                    ii_exist, jj_exist):
    """Native greedy NMS edge proposer; returns [n,2] int64 edges or None."""
    lib = get_lib()
    if lib is None:
        return None
    d = np.ascontiguousarray(d, np.float64)
    ii_exist = np.ascontiguousarray(ii_exist, np.int64)
    jj_exist = np.ascontiguousarray(jj_exist, np.int64)
    max_out = 4 * max(t * t, 1024)
    out = np.empty((max_out, 2), np.int64)
    n = lib.proximity_edges(
        _ptr(d, ctypes.c_double), ctypes.c_int(t0), ctypes.c_int(t1),
        ctypes.c_int(t), ctypes.c_int(rad), ctypes.c_int(nms),
        ctypes.c_double(thresh), ctypes.c_int(max_factors),
        ctypes.c_int(int(stereo)), _ptr(ii_exist, ctypes.c_int64),
        _ptr(jj_exist, ctypes.c_int64), ctypes.c_int(len(ii_exist)),
        _ptr(out, ctypes.c_int64), ctypes.c_int(max_out))
    return out[:n]
