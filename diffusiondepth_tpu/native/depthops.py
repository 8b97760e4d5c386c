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
