"""Build + load the native host geometry library (ctypes).

Compiled on demand with g++ (-O3 -march=native) into this directory;
callers fall back to the numpy/scipy implementations when compilation is
unavailable. The C ABI is defined in src/geometry.cpp.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, 'src', 'geometry.cpp')
_LIB_PATH = os.path.join(_DIR, 'libd3feat_geometry.so')
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    cmd = ['g++', '-O3', '-march=native', '-shared', '-fPIC', '-std=c++17',
           '-o', _LIB_PATH, _SRC, '-lpthread']
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        src_mtime = os.path.getmtime(_SRC) if os.path.exists(_SRC) else 0
        stale = (not os.path.exists(_LIB_PATH)
                 or os.path.getmtime(_LIB_PATH) < src_mtime)
        if stale and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.d3f_grid_subsample.restype = ctypes.c_int
        lib.d3f_grid_subsample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_float,
            ctypes.POINTER(ctypes.c_float)]
        lib.d3f_radius_knn.restype = None
        lib.d3f_radius_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
        lib.d3f_radius_knn_rel.restype = None
        lib.d3f_radius_knn_rel.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_float, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int16)]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def grid_subsample_native(points: np.ndarray, dl: float) -> np.ndarray:
    lib = load()
    assert lib is not None
    pts = np.ascontiguousarray(points, dtype=np.float32)
    n = pts.shape[0]
    if n == 0:
        return pts
    out = np.empty((n, 3), dtype=np.float32)
    m = lib.d3f_grid_subsample(_fptr(pts), n, ctypes.c_float(dl), _fptr(out))
    return out[:m].copy()


def radius_knn_native(queries: np.ndarray, supports: np.ndarray,
                      radius: float, k: int) -> np.ndarray:
    lib = load()
    assert lib is not None
    q = np.ascontiguousarray(queries, dtype=np.float32)
    s = np.ascontiguousarray(supports, dtype=np.float32)
    out = np.empty((q.shape[0], k), dtype=np.int32)
    if q.shape[0] == 0:
        return out
    lib.d3f_radius_knn(_fptr(q), q.shape[0], _fptr(s), s.shape[0],
                       ctypes.c_float(radius), k, _iptr(out))
    return out


def radius_knn_rel_native(queries: np.ndarray, supports: np.ndarray,
                          radius: float, k: int
                          ) -> tuple[np.ndarray, np.ndarray]:
    """(indices [Nq,k] int32, rel [Nq,k,3] int16 quantized by radius/32767)."""
    lib = load()
    assert lib is not None
    q = np.ascontiguousarray(queries, dtype=np.float32)
    s = np.ascontiguousarray(supports, dtype=np.float32)
    out = np.empty((q.shape[0], k), dtype=np.int32)
    rel = np.empty((q.shape[0], k, 3), dtype=np.int16)
    if q.shape[0] == 0:
        return out, rel
    lib.d3f_radius_knn_rel(
        _fptr(q), q.shape[0], _fptr(s), s.shape[0],
        ctypes.c_float(radius), k, _iptr(out),
        rel.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
    return out, rel
