"""ctypes bindings for the dvm_native C++ host kernels.

Auto-builds `native/libdvm_native.so` with `make` on first use (g++ with
OpenMP); every entry point has a pure-Python fallback, so the package works
without a toolchain — native is a speed path, not a hard dependency.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdvm_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_NATIVE_DIR)], check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.read_off_header.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.read_off_header.restype = ctypes.c_int
        lib.read_off_data.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.read_off_data.restype = ctypes.c_int
        lib.dijkstra_all.argtypes = [
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.fps.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except Exception as e:  # toolchain absent / build failure -> fallback
        print(f"[dvm_native] unavailable ({e}); using Python fallbacks")
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def read_off(path: str):
    """Native OFF reader -> (verts f32 (N,3), faces i32 (M,3) | None)."""
    lib = _load()
    if lib is None:
        return None
    nv = ctypes.c_int64()
    nf = ctypes.c_int64()
    if lib.read_off_header(path.encode(), ctypes.byref(nv), ctypes.byref(nf)):
        return None
    verts = np.empty((nv.value, 3), np.float32)
    faces = np.empty((max(nf.value, 1), 3), np.int32)
    rc = lib.read_off_data(
        path.encode(), nv.value, nf.value,
        _ptr(verts, ctypes.c_float), _ptr(faces, ctypes.c_int32),
    )
    if rc:
        return None
    return verts, (faces if nf.value > 0 else None)


def dijkstra_all(indptr: np.ndarray, indices: np.ndarray, weights: np.ndarray):
    """All-pairs shortest paths over a CSR graph -> (n, n) f32, or None."""
    lib = _load()
    if lib is None:
        return None
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    weights = np.ascontiguousarray(weights, np.float32)
    out = np.empty((n, n), np.float32)
    lib.dijkstra_all(
        n, _ptr(indptr, ctypes.c_int64), _ptr(indices, ctypes.c_int32),
        _ptr(weights, ctypes.c_float), _ptr(out, ctypes.c_float),
    )
    return out


def fps(points: np.ndarray, npoint: int, start: int = 0):
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, np.float32)
    out = np.empty(npoint, np.int64)
    lib.fps(
        _ptr(pts, ctypes.c_float), pts.shape[0], npoint, start,
        _ptr(out, ctypes.c_int64),
    )
    return out
