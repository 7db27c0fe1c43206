"""ctypes bridge to the native host runtime (nmf_native.cpp).

Compiled lazily with g++ on first use (cached next to the source); every
entry point has a pure-Python fallback so the framework works without a
toolchain.  See nmf_native.cpp for what lives here and why.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "nmf_native.cpp")
_SO = os.path.join(os.path.dirname(__file__), "_nmf_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-std=c++17", "-pthread", _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(_SO)
            lib.convhull2d.restype = ctypes.c_int
            lib.convhull2d.argtypes = [
                ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64)]
            lib.load_bytes.restype = ctypes.c_int
            lib.load_bytes.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def convhull2d(points: np.ndarray) -> np.ndarray | None:
    """Hull indices of (n, 2) points via the native monotone chain;
    None when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    out = np.empty(n if n > 2 else 2, dtype=np.int64)
    cnt = lib.convhull2d(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if cnt < 0:
        return None
    return np.unique(out[:cnt])


def load_bytes(path: str, dst: np.ndarray, offset: int = 0,
               threads: int = 8) -> bool:
    """Fill ``dst`` (contiguous) from ``path`` starting at byte ``offset``
    with multi-threaded reads.  Returns False when unavailable/failed."""
    lib = _load()
    if lib is None:
        return False
    assert dst.flags["C_CONTIGUOUS"]
    rc = lib.load_bytes(path.encode(), dst.ctypes.data_as(ctypes.c_void_p),
                        ctypes.c_int64(offset), ctypes.c_int64(dst.nbytes),
                        ctypes.c_int(threads))
    return rc == 0
