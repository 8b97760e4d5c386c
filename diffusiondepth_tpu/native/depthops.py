"""ctypes binding for libdepthops.so (see depthops.cpp)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libdepthops.so")

_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _HERE, "libdepthops.so"],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.simple_depth_completion.argtypes = [fp, fp, ctypes.c_int64, ctypes.c_int64]
    lib.simple_depth_completion.restype = None
    lib.simple_depth_completion_batch.argtypes = [
        fp, fp, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64
    ]
    lib.simple_depth_completion_batch.restype = None
    lib.decode_png_gray16.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.c_int64,
    ]
    lib.decode_png_gray16.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def simple_depth_completion(depth: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(H, W) float32 depth with 0 == missing -> (filled, distance)."""
    lib = _load()
    assert lib is not None, "libdepthops.so unavailable"
    canvas = np.ascontiguousarray(depth, np.float32).copy()
    dist = np.zeros_like(canvas)
    h, w = canvas.shape
    fp = ctypes.POINTER(ctypes.c_float)
    lib.simple_depth_completion(
        canvas.ctypes.data_as(fp), dist.ctypes.data_as(fp), h, w
    )
    return canvas, dist


def decode_png_gray16(data: bytes) -> Optional[np.ndarray]:
    """16-bit grayscale PNG bytes -> (H, W) uint16, or None when the file is
    not in the strict KITTI depth format (caller falls back to PIL). The
    dims come from the IHDR (offset 16/20, big-endian)."""
    lib = _load()
    if lib is None or len(data) < 33:
        return None
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    if w <= 0 or h <= 0 or w * h > 2**28:
        return None
    out = np.empty((h, w), np.uint16)
    buf = (ctypes.c_uint8 * len(data)).from_buffer_copy(data)
    rc = lib.decode_png_gray16(
        buf, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h * w,
    )
    return out if rc == 0 else None


def simple_depth_completion_batch(depth: np.ndarray) -> np.ndarray:
    """(N, H, W) float32 -> filled (N, H, W)."""
    lib = _load()
    assert lib is not None, "libdepthops.so unavailable"
    canvas = np.ascontiguousarray(depth, np.float32).copy()
    dist = np.zeros_like(canvas)
    n, h, w = canvas.shape
    fp = ctypes.POINTER(ctypes.c_float)
    lib.simple_depth_completion_batch(
        canvas.ctypes.data_as(fp), dist.ctypes.data_as(fp), n, h, w
    )
    return canvas
