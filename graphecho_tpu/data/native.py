"""ctypes binding for the native C++ data-pipeline kernels.

Compiles `native/dataops.cpp` on first use (g++ is in the image; pybind11 is
not, so the library exposes a C ABI consumed via ctypes). Every entry point
returns None when the native library is unavailable so callers fall back to
the numpy implementations in `graphecho_tpu.data.transforms`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "native", "dataops.cpp")
_SO = os.path.join(_ROOT, "native", "libdataops.so")


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        i64 = ctypes.c_int64
        lib.ge_nearest_resize_batch.argtypes = [
            ctypes.c_void_p, i64, i64, i64, i64, ctypes.c_void_p, i64, i64,
            ctypes.c_int]
        lib.ge_polygon_mask.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
            i64, i64, i64, ctypes.POINTER(ctypes.c_float)]
        lib.ge_normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), i64, ctypes.POINTER(ctypes.c_float)]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def nearest_resize(arr: np.ndarray, oh: int, ow: int) -> Optional[np.ndarray]:
    """(H, W, ...) nearest resize via the native kernel; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    if arr.dtype == np.float32:
        dtype_code = 0
    elif arr.dtype == np.uint8:
        dtype_code = 1
    else:
        return None
    h, w = arr.shape[:2]
    trailing = arr.shape[2:]
    c = int(np.prod(trailing)) if trailing else 1
    src = np.ascontiguousarray(arr).reshape(1, h, w, c)
    out = np.empty((1, oh, ow, c), arr.dtype)
    lib.ge_nearest_resize_batch(
        src.ctypes.data_as(ctypes.c_void_p), 1, h, w, c,
        out.ctypes.data_as(ctypes.c_void_p), oh, ow, dtype_code)
    return out.reshape((oh, ow) + trailing)


def nearest_resize_batch(arr: np.ndarray, oh: int, ow: int
                         ) -> Optional[np.ndarray]:
    """(N, H, W, C) batched nearest resize (threaded)."""
    lib = _load()
    if lib is None:
        return None
    if arr.dtype == np.float32:
        dtype_code = 0
    elif arr.dtype == np.uint8:
        dtype_code = 1
    else:
        return None
    n, h, w, c = arr.shape
    src = np.ascontiguousarray(arr)
    out = np.empty((n, oh, ow, c), arr.dtype)
    lib.ge_nearest_resize_batch(
        src.ctypes.data_as(ctypes.c_void_p), n, h, w, c,
        out.ctypes.data_as(ctypes.c_void_p), oh, ow, dtype_code)
    return out


def polygon_mask(ys: Sequence[float], xs: Sequence[float],
                 shape: Tuple[int, int]) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    ys = np.ascontiguousarray(ys, np.float64)
    xs = np.ascontiguousarray(xs, np.float64)
    if ys.shape != xs.shape:
        raise ValueError(f"ys/xs length mismatch: {ys.shape} vs {xs.shape}")
    out = np.zeros(shape, np.float32)
    lib.ge_polygon_mask(
        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        len(ys), shape[0], shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def normalize_u8(arr: np.ndarray) -> Optional[np.ndarray]:
    """uint8 -> float32 / 255 via the native kernel."""
    lib = _load()
    if lib is None or arr.dtype != np.uint8:
        return None
    src = np.ascontiguousarray(arr)
    out = np.empty(arr.shape, np.float32)
    lib.ge_normalize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
