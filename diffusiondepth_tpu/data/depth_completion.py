"""Scanline depth completion (host-side preprocessing).

Re-implements the reference's numba-JIT ``simple_depth_completion``
(src/model/ops/depth_map_proc.py:7-52) - 4-directional nearest-valid
propagation with distance records - with identical semantics:

  pass 1: per column, a downward then an upward sweep;
  pass 2: per row (on pass-1 output), a rightward then a leftward sweep.

Each sweep carries (prev_depth, prev_distance); empty pixels (==0) take the
carried value, non-empty pixels are replaced when the carried distance beats
their recorded distance.

Two engines: a vectorised numpy fallback (sweeps are sequential along the
sweep axis, vectorised across the other), and a native C++ engine
(native/depthops.cpp via ctypes) mirroring the reference's use of
LLVM-compiled code for this op. Selected automatically.
"""

from __future__ import annotations

import numpy as np

INF = 1e8

_native = None
_native_checked = False


def _load_native():
    global _native, _native_checked
    if _native_checked:
        return _native
    _native_checked = True
    try:
        from ..native import depthops

        _native = depthops
    except Exception:
        _native = None
    return _native


def _sweep(canvas: np.ndarray, dist: np.ndarray, axis: int, reverse: bool):
    """One directional sweep, vectorised across the non-sweep axis, in place."""
    n = canvas.shape[axis]
    idxs = range(n - 1, -1, -1) if reverse else range(n)
    take = (lambda a, i: a[i, :]) if axis == 0 else (lambda a, i: a[:, i])

    first = True
    prev_depth = None
    prev_dist = None
    for i in idxs:
        cur = take(canvas, i)
        cur_d = take(dist, i)
        if first:
            prev_depth = np.zeros_like(cur)
            prev_dist = np.full_like(cur_d, INF)
            first = False
        empty = cur == 0
        new_depth = np.where(empty, prev_depth, cur)
        new_dist = np.where(empty, prev_dist, cur_d)
        better = (~empty) & (cur_d > prev_dist)
        new_depth = np.where(better, prev_depth, new_depth)
        new_dist = np.where(better, prev_dist, new_dist)
        if axis == 0:
            canvas[i, :] = new_depth
            dist[i, :] = new_dist
        else:
            canvas[:, i] = new_depth
            dist[:, i] = new_dist
        prev_depth = new_depth
        prev_dist = new_dist + 1.0


def simple_depth_completion_numpy(depth: np.ndarray):
    """Exact numpy re-implementation of the reference algorithm."""
    canvas = depth.astype(np.float32).copy()
    dist = np.zeros_like(canvas)
    # pass 1: columns - down then up (order matters, reference :46-48)
    _sweep(canvas, dist, axis=0, reverse=False)
    _sweep(canvas, dist, axis=0, reverse=True)
    # pass 2: rows - right then left
    _sweep(canvas, dist, axis=1, reverse=False)
    _sweep(canvas, dist, axis=1, reverse=True)
    return canvas, dist


def simple_depth_completion(depth: np.ndarray):
    """Fill empty (==0) pixels from nearest valid neighbours.

    Returns (filled_depth, distance_record) like the reference.
    """
    native = _load_native()
    if native is not None:
        return native.simple_depth_completion(depth)
    return simple_depth_completion_numpy(depth)
