"""ctypes loader + wrappers for the native host-side kernels (csrc/).

The C++ library fuses protein edge thresholding with featurization, emitting
COO edges directly instead of the reference's dense n*n NaN-marked tensors
(utils/create_protein_features.py:201-357 + utils/create_graphs.py:6-62).
Built on demand with g++ (no pybind11 in this image; plain C ABI via ctypes)
and cached next to the package. Falls back to the numpy path silently when
compilation is unavailable (set CASTER_DTA_NO_NATIVE=1 to force the
fallback; CASTER_DTA_REQUIRE_NATIVE=1 to raise instead of falling back).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc", "caster_host.cpp")
_LIB_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "_caster_host.so")
_lock = threading.Lock()
_lib = None
_tried = False

_MODES = {"dist": 0, "num": 1, "prop": 2}


def _build_lib() -> bool:
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _LIB_PATH, _SRC]
    try:
        res = subprocess.run(cmd, capture_output=True, timeout=300)
        return res.returncode == 0 and os.path.exists(_LIB_PATH)
    except (OSError, subprocess.TimeoutExpired):
        return False


def load_library():
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("CASTER_DTA_NO_NATIVE"):
            return None
        try:
            if (not os.path.exists(_LIB_PATH)
                    or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)):
                if not _build_lib():
                    if os.environ.get("CASTER_DTA_REQUIRE_NATIVE"):
                        raise RuntimeError("native build failed")
                    return None
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            if os.environ.get("CASTER_DTA_REQUIRE_NATIVE"):
                raise
            return None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.cdt_protein_edges.restype = ctypes.c_int64
        lib.cdt_protein_edges.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_double, ctypes.c_int,
            ctypes.c_int, i32p, i32p, f32p, f32p, ctypes.c_int64]
        lib.cdt_sort_edges_by_dst.restype = ctypes.c_int64
        lib.cdt_sort_edges_by_dst.argtypes = [i32p, ctypes.c_int64, i32p]
        _lib = lib
        return _lib


def available() -> bool:
    return load_library() is not None


def protein_edges(alpha: np.ndarray, edge_thresh: float, thresh_type: str,
                  keep_self_loops: bool):
    """Fused threshold+featurize of residue edges.

    alpha: [n, 3] float32 CA coordinates. Returns (src i32 [E], dst i32 [E],
    edge_s f32 [E, 32], edge_v f32 [E, 1, 3]) in row-major (src-major) order —
    the same order np.nonzero gives the dense reference path.
    Raises RuntimeError when the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native host library unavailable")
    alpha = np.ascontiguousarray(alpha, np.float32)
    n = alpha.shape[0]
    mode = _MODES[thresh_type]
    dummy_i = np.empty(0, np.int32)
    dummy_f = np.empty(0, np.float32)
    e = lib.cdt_protein_edges(alpha, n, float(edge_thresh), mode,
                              int(keep_self_loops), dummy_i, dummy_i,
                              dummy_f, dummy_f, 0)
    src = np.empty(e, np.int32)
    dst = np.empty(e, np.int32)
    edge_s = np.empty((e, 32), np.float32)
    edge_v = np.empty((e, 3), np.float32)
    e2 = lib.cdt_protein_edges(alpha, n, float(edge_thresh), mode,
                               int(keep_self_loops), src, dst,
                               edge_s.reshape(-1), edge_v.reshape(-1), e)
    assert e2 == e, "edge count changed between sizing and fill passes"
    return src, dst, edge_s, edge_v.reshape(e, 1, 3)


def sort_edges_by_dst(dst: np.ndarray) -> np.ndarray:
    """Stable-by-dst permutation of edge indices (native, falls back to
    np.argsort(kind='stable'))."""
    lib = load_library()
    dst = np.ascontiguousarray(dst, np.int32)
    if lib is None:
        return np.argsort(dst, kind="stable").astype(np.int32)
    perm = np.empty(len(dst), np.int32)
    lib.cdt_sort_edges_by_dst(dst, len(dst), perm)
    return perm
