"""Resize / adaptive pooling ops for NHWC tensors.

TPU-first design: separable interpolation expressed as two small dense
matmuls (H-matrix and W-matrix), which XLA maps straight onto the MXU and
fuses with surrounding elementwise work. All interpolation matrices are
built in numpy at trace time (static shapes), bit-matching
``torch.nn.functional.interpolate`` semantics for both ``align_corners``
modes and ``adaptive_{avg,max}_pool2d`` window arithmetic.

Replaces the reference's ``F.interpolate`` / ``adaptive_avg_pool2d`` calls
(reference: src/model/ops/resize.py:8-27; FPN pooling in
src/model/head/ddim_depth_estimate_res.py:117; UpSample_add in
src/model/head/ddim_depth_estimate_res_swin_addHAHI.py:317,332).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _bilinear_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """(out, in) interpolation matrix matching torch bilinear semantics."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    if out_size == 1:
        # torch: single output samples src position 0 (align_corners) or center
        if align_corners:
            m[0, 0] = 1.0
            return m
        src = np.array([0.5 * in_size / 1.0 - 0.5])
    elif align_corners:
        src = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    else:
        src = (np.arange(out_size) + 0.5) * in_size / out_size - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    for i in range(out_size):
        m[i, lo[i]] += 1.0 - w[i]
        m[i, hi[i]] += w[i]
    return m


@functools.lru_cache(maxsize=None)
def _adaptive_avg_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) averaging matrix matching torch adaptive_avg_pool window math:
    window_i = [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)  # ceil div
        m[i, start:end] = 1.0 / (end - start)
    return m


def _apply_hw_matrices(x: jnp.ndarray, mh: np.ndarray, mw: np.ndarray) -> jnp.ndarray:
    """Apply (Ho,Hi) and (Wo,Wi) matrices along H and W of an NHWC tensor.

    precision=HIGHEST: on TPU, float32 matmuls default to bfloat16 passes;
    these ops must be bit-faithful interpolators, and the matrices are tiny.
    """
    mh = jnp.asarray(mh, x.dtype)
    mw = jnp.asarray(mw, x.dtype)
    p = jax.lax.Precision.HIGHEST
    x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=p)
    x = jnp.einsum("ow,bhwc->bhoc", mw, x, precision=p)
    return x


def resize_bilinear(
    x: jnp.ndarray,
    size: Tuple[int, int],
    align_corners: bool = False,
) -> jnp.ndarray:
    """Bilinear resize of NHWC tensor to (H, W) = size, torch-exact."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _apply_hw_matrices(
        x,
        _bilinear_matrix(h_in, h_out, align_corners),
        _bilinear_matrix(w_in, w_out, align_corners),
    )


@functools.lru_cache(maxsize=None)
def _nearest_index(in_size: int, out_size: int) -> np.ndarray:
    # torch 'nearest' (legacy): floor(i * in / out)
    return np.minimum((np.arange(out_size) * in_size) // out_size, in_size - 1)


def resize_nearest(x: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of NHWC tensor, matching torch mode='nearest'."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    x = jnp.take(x, jnp.asarray(_nearest_index(h_in, h_out)), axis=1)
    x = jnp.take(x, jnp.asarray(_nearest_index(w_in, w_out)), axis=2)
    return x


def adaptive_avg_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """torch adaptive_avg_pool2d for NHWC tensors (exact window arithmetic)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = output_size
    if (h_in, w_in) == (h_out, w_out):
        return x
    return _apply_hw_matrices(
        x, _adaptive_avg_matrix(h_in, h_out), _adaptive_avg_matrix(w_in, w_out)
    )


def _adaptive_max_1d(x: jnp.ndarray, axis: int, out_size: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    segments = []
    for i in range(out_size):
        start = (i * in_size) // out_size
        end = -((-(i + 1) * in_size) // out_size)
        seg = jax.lax.slice_in_dim(x, start, end, axis=axis)
        segments.append(jnp.max(seg, axis=axis, keepdims=True))
    return jnp.concatenate(segments, axis=axis)


def adaptive_max_pool2d(x: jnp.ndarray, output_size: Tuple[int, int]) -> jnp.ndarray:
    """torch adaptive_max_pool2d for NHWC tensors."""
    x = _adaptive_max_1d(x, 1, output_size[0])
    x = _adaptive_max_1d(x, 2, output_size[1])
    return x


def upsample2x_bilinear(x: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """scale_factor=2 bilinear upsample (reference up_scale lambda,
    src/model/head/ddim_depth_estimate_res.py:35)."""
    return resize_bilinear(x, (x.shape[1] * 2, x.shape[2] * 2), align_corners)
