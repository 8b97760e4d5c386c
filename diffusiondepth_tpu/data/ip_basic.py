"""ip_basic classical depth densification (input-pipeline op).

Re-implements the morphological completion cascade the reference vendors
(src/model/ops/ip_basic.py:65-287, itself from kujason/ip_basic): invert
depth, distance-binned dilation, hole closing, masked median/bilateral
smoothing, invert back. Used by ``Diffusion_DCbase_Model`` when
``depth_map='ip_basic'`` (reference diffusion_dcbase_model.py:96-110) — host
preprocessing, never on the TPU path, so it lives in the data layer.

cv2 is used when present; a pure-scipy fallback keeps the op available in
minimal images.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    _HAS_CV2 = False


def _kernel_full(n: int) -> np.ndarray:
    return np.ones((n, n), np.uint8)


def _kernel_cross(n: int) -> np.ndarray:
    k = np.zeros((n, n), np.uint8)
    k[n // 2, :] = 1
    k[:, n // 2] = 1
    return k


def _kernel_diamond(n: int) -> np.ndarray:
    r = n // 2
    y, x = np.ogrid[-r : r + 1, -r : r + 1]
    return (np.abs(y) + np.abs(x) <= r).astype(np.uint8)


def _dilate(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    if _HAS_CV2:
        return cv2.dilate(img, kernel)
    from scipy import ndimage

    return ndimage.grey_dilation(img, footprint=kernel.astype(bool))


def _close(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    if _HAS_CV2:
        return cv2.morphologyEx(img, cv2.MORPH_CLOSE, kernel)
    from scipy import ndimage

    foot = kernel.astype(bool)
    return ndimage.grey_erosion(ndimage.grey_dilation(img, footprint=foot),
                                footprint=foot)


def _median5(img: np.ndarray) -> np.ndarray:
    if _HAS_CV2:
        return cv2.medianBlur(img, 5)
    from scipy import ndimage

    return ndimage.median_filter(img, size=5)


def _bilateral(img: np.ndarray, d: int, sc: float, ss: float) -> np.ndarray:
    if _HAS_CV2:
        return cv2.bilateralFilter(img, d, sc, ss)
    # gaussian approximation when cv2 is unavailable
    from scipy import ndimage

    return ndimage.gaussian_filter(img, sigma=ss / 2.0)


def _gaussian(img: np.ndarray, k: int) -> np.ndarray:
    if _HAS_CV2:
        return cv2.GaussianBlur(img, (k, k), 0)
    from scipy import ndimage

    return ndimage.gaussian_filter(img, sigma=0.3 * ((k - 1) * 0.5 - 1) + 0.8)


def _top_mask(depth: np.ndarray) -> np.ndarray:
    """True at/below each column's highest valid pixel (vectorized form of
    the reference's per-column loops, ip_basic.py:211-216,231-243)."""
    valid = depth > 0.1
    top_row = np.argmax(valid, axis=0)  # 0 when column empty
    top_row = np.where(valid.any(axis=0), top_row, depth.shape[0])
    rows = np.arange(depth.shape[0])[:, None]
    return rows >= top_row[None, :]


def fill_in_fast(
    depth_map: np.ndarray,
    max_depth: float = 100.0,
    custom_kernel: Optional[np.ndarray] = None,
    extrapolate: bool = False,
    blur_type: str = "bilateral",
    blur_kernel_size: int = 5,
) -> np.ndarray:
    """Single-scale completion (reference ip_basic.py:65-134)."""
    d = np.float32(depth_map).copy()
    kernel = _kernel_diamond(5) if custom_kernel is None else custom_kernel

    valid = d > 0.1
    d[valid] = max_depth - d[valid]  # invert so dilation prefers NEAR

    d = _dilate(d, kernel)
    d = _close(d, _kernel_full(5))

    empty = d < 0.1
    d[empty] = _dilate(d, _kernel_full(7))[empty]

    if extrapolate:
        mask = _top_mask(d)
        col_top_vals = d[np.argmax(d > 0.1, axis=0), np.arange(d.shape[1])]
        d = np.where(~mask, col_top_vals[None, :], d).astype(np.float32)
        empty = d < 0.1
        d[empty] = _dilate(d, _kernel_full(31))[empty]

    d = _median5(d)
    if blur_type == "bilateral":
        d = _bilateral(d, blur_kernel_size, 1.5, 2.0)
    elif blur_type == "gaussian":
        valid = d > 0.1
        blurred = _gaussian(d, blur_kernel_size)
        d[valid] = blurred[valid]

    valid = d > 0.1
    d[valid] = max_depth - d[valid]
    return d


def fill_in_multiscale(
    depth_map: np.ndarray,
    max_depth: float = 100.0,
    extrapolate: bool = False,
    blur_type: str = "bilateral",
) -> Tuple[np.ndarray, None]:
    """Distance-binned multi-scale completion (reference ip_basic.py:137-287):
    far/med/near points dilated with growing cross kernels so that close
    structures stay crisp while distant returns spread further."""
    d_in = np.float32(depth_map).copy()

    near = (d_in > 0.1) & (d_in <= 15.0)
    med = (d_in > 15.0) & (d_in <= 30.0)
    far = d_in > 30.0

    d = d_in.copy()
    valid = d > 0.1
    d[valid] = max_depth - d[valid]

    dil_far = _dilate(d * far, _kernel_cross(3))
    dil_med = _dilate(d * med, _kernel_cross(5))
    dil_near = _dilate(d * near, _kernel_cross(7))

    out = d.copy()
    for dil in (dil_far, dil_med, dil_near):  # nearest wins (written last)
        m = dil > 0.1
        out[m] = dil[m]

    out = _close(out, _kernel_full(5))

    blurred = _median5(out)
    valid = out > 0.1
    out[valid] = blurred[valid]

    # fill holes below each column's highest return
    mask = _top_mask(out)
    empty = (out <= 0.1) & mask
    out[empty] = _dilate(out, _kernel_full(9))[empty]

    if extrapolate:
        col_top_vals = out[np.argmax(out > 0.1, axis=0), np.arange(out.shape[1])]
        out = np.where(~mask, col_top_vals[None, :], out).astype(np.float32)
        mask = np.ones_like(mask)

    for _ in range(6):
        empty = (out < 0.1) & mask
        out[empty] = _dilate(out, _kernel_full(5))[empty]

    blurred = _median5(out)
    valid = (out > 0.1) & mask
    out[valid] = blurred[valid]

    if blur_type == "gaussian":
        blurred = _gaussian(out, 5)
        valid = (out > 0.1) & mask
        out[valid] = blurred[valid]
    elif blur_type == "bilateral":
        blurred = _bilateral(out, 5, 0.5, 2.0)
        out[valid] = blurred[valid]

    valid = out > 0.1
    out[valid] = max_depth - out[valid]
    return out, None


def densify_depth_map(depth_map: np.ndarray, depth_mask: np.ndarray) -> np.ndarray:
    """The model-level ip_basic branch, host-side: mask, clamp to [0, 100],
    then ``fill_in_multiscale`` (reference
    diffusion_dcbase_model.py:96-110 ``_extract_depth_ipbasic`` — which is
    constructor-only there and broken at runtime [undefined ``N``, tuple
    return]; this is the working form the datasets apply under
    ``--ip_basic``). Accepts (H, W) or (H, W, 1); returns the same shape."""
    dm = np.float32(depth_map)
    mask = np.float32(depth_mask).reshape(dm.shape)
    chan = dm.ndim == 3
    if chan:
        dm, mask = dm[..., 0], mask[..., 0]
    dm = np.clip(dm * mask, 0.0, 100.0)
    out, _ = fill_in_multiscale(dm)
    return out[..., None] if chan else out
