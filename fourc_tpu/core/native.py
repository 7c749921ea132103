"""ctypes bindings to the native meshkit library (native/meshkit.cpp).

Host-side C++ runtime for mesh generation / partitioning / dof-map
construction (see meshkit.cpp header for the reference counterparts).
Auto-builds with g++ on first use; every entry point has a numpy fallback
so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    so = os.path.join(root, "native", "libmeshkit.so")
    src = os.path.join(root, "native", "meshkit.cpp")
    if not os.path.exists(so) or (
        os.path.exists(src) and os.path.getmtime(src) > os.path.getmtime(so)
    ):
        try:
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-shared",
                 "-o", so, src],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.hex_box_conn.argtypes = [ctypes.c_int32] * 3 + [i32p]
    lib.hex_box_coords.argtypes = [ctypes.c_int32] * 3 + [f64p, f64p, f64p]
    lib.rcb_order.argtypes = [f64p, ctypes.c_int64, ctypes.c_int32,
                              ctypes.c_int32, i32p]
    lib.build_dof_perm.argtypes = [i32p, ctypes.c_int64, ctypes.c_int64,
                                   i32p, i32p]
    lib.node_element_csr.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                                     ctypes.c_int64, i64p, i32p]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
    lib.lbvh_build.argtypes = [f64p, f64p, ctypes.c_int64, i32p, i32p, i32p,
                               f32p, f32p]
    lib.match_nodes.argtypes = [f64p, ctypes.c_int64, f64p, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_double, i64p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _lib() is not None


def hex_box(nx: int, ny: int, nz: int, lo, hi):
    """(coords (n,3) f64, conn (E,8) i32) or None if the lib is missing."""
    lib = _lib()
    if lib is None:
        return None
    n = (nx + 1) * (ny + 1) * (nz + 1)
    coords = np.empty((n, 3), np.float64)
    conn = np.empty((nx * ny * nz, 8), np.int32)
    lib.hex_box_coords(nx, ny, nz, np.asarray(lo, np.float64),
                       np.asarray(hi, np.float64), coords)
    lib.hex_box_conn(nx, ny, nz, conn)
    return coords, conn


def rcb_order(points: np.ndarray, n_parts: int):
    lib = _lib()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float64)
    levels = int(np.ceil(np.log2(max(n_parts, 1))))
    perm = np.empty(pts.shape[0], np.int32)
    lib.rcb_order(pts, pts.shape[0], pts.shape[1], levels, perm)
    return perm


def lbvh_build(box_lo: np.ndarray, box_hi: np.ndarray):
    """Karras LBVH arrays (left, right, order, lo_all, hi_all) or None."""
    lib = _lib()
    if lib is None:
        return None
    lo = np.ascontiguousarray(box_lo, np.float64)
    hi = np.ascontiguousarray(box_hi, np.float64)
    n = lo.shape[0]
    left = np.empty(max(n - 1, 0), np.int32)
    right = np.empty(max(n - 1, 0), np.int32)
    order = np.empty(n, np.int32)
    lo_all = np.empty((2 * n - 1, 3), np.float32)
    hi_all = np.empty((2 * n - 1, 3), np.float32)
    lib.lbvh_build(lo, hi, n, left, right, order, lo_all, hi_all)
    return left, right, order, lo_all, hi_all


def match_nodes(a: np.ndarray, b: np.ndarray, tol: float):
    lib = _lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, np.float64)
    b = np.ascontiguousarray(b, np.float64)
    out = np.empty(a.shape[0], np.int64)
    lib.match_nodes(a, a.shape[0], b, b.shape[0], a.shape[1], float(tol), out)
    return out


def build_dof_perm(edof_flat: np.ndarray, ndof: int):
    lib = _lib()
    if lib is None:
        return None
    ef = np.ascontiguousarray(edof_flat, np.int32)
    perm = np.empty(ef.shape[0], np.int32)
    sorted_dof = np.empty(ef.shape[0], np.int32)
    lib.build_dof_perm(ef, ef.shape[0], int(ndof), perm, sorted_dof)
    return perm, sorted_dof
