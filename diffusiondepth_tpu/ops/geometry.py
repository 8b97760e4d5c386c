"""Camera/lidar geometry ops (JAX).

Re-implements the reference's frustum + projection utilities:
  * ``convert_depth_map_to_points`` - per-pixel frustum creation and
    unprojection to the ego frame (reference:
    src/model/ops/depth_map_to_points.py:4-80), consumed by the
    shape-regularisation loss
  * ``project_lidar_to_cam`` - lidar point projection into image planes with
    validity masks (reference: src/model/ops/project_lidar_to_cam.py:6-63;
    unused on the default path)
  * pad helpers (reference: src/model/ops/misc.py - numba/torch variants
    collapse to one jnp function each)

All static-shape; masks are returned instead of boolean gathers so the ops
compile under jit (out-of-frame lidar points are zeroed + masked rather than
dropped).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def pad_ones(arr: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    shape = list(arr.shape)
    shape[axis] = 1
    return jnp.concatenate([arr, jnp.ones(shape, arr.dtype)], axis=axis)


def pad_zeros(arr: jnp.ndarray, axis: int = 0, n: int = 1) -> jnp.ndarray:
    shape = list(arr.shape)
    shape[axis] = n
    return jnp.concatenate([arr, jnp.zeros(shape, arr.dtype)], axis=axis)


def pad_constants(arr: jnp.ndarray, value, axis: int = 0, n: int = 1) -> jnp.ndarray:
    shape = list(arr.shape)
    shape[axis] = n
    return jnp.concatenate([arr, jnp.full(shape, value, arr.dtype)], axis=axis)


def create_frustum(
    depth_map: jnp.ndarray, input_size: Tuple[int, int], downsample: int
) -> jnp.ndarray:
    """(B, N_cam, D, fH, fW) depths -> (B, N_cam, D, fH, fW, 3) pixel frustum
    (reference depth_map_to_points.py:4-22): (x_px, y_px, depth) triplets on
    the full-resolution pixel grid."""
    b, n_cam, d, fh, fw = depth_map.shape
    ogf_h, ogf_w = input_size
    assert fh == ogf_h // downsample and fw == ogf_w // downsample
    ds = jnp.clip(depth_map, 0.0, None)
    xs = jnp.broadcast_to(
        jnp.linspace(0.0, ogf_w - 1, fw).reshape(1, 1, 1, 1, fw),
        (b, n_cam, d, fh, fw),
    )
    ys = jnp.broadcast_to(
        jnp.linspace(0.0, ogf_h - 1, fh).reshape(1, 1, 1, fh, 1),
        (b, n_cam, d, fh, fw),
    )
    return jnp.stack([xs, ys, ds], axis=-1)


def get_geometry(
    frustum: jnp.ndarray,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    offset: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Unproject frustum pixels to ego-frame xyz (reference :25-52).

    rots/trans: (B, N, 3, 3) / (B, N, 3) cam->ego; intrins (B, N, 3, 3) or
    (B, N, 3, 4) (KITTI projective with translation column, handled like
    reference :43-46); post_rots/post_trans undo image augmentation.
    """
    b, n = trans.shape[:2]
    pts = frustum - post_trans.reshape(b, n, 1, 1, 1, 3)
    if offset is not None:
        _, d, h, w = offset.shape
        pts = pts.at[..., 2].add(offset.reshape(b, n, d, h, w))
    inv_post = jnp.linalg.inv(post_rots).reshape(b, n, 1, 1, 1, 3, 3)
    pts = inv_post @ pts[..., None]

    pts = jnp.concatenate([pts[..., :2, :] * pts[..., 2:3, :], pts[..., 2:3, :]],
                          axis=-2)
    if intrins.shape[-1] == 4:
        shift = intrins[..., :3, 3]
        pts = pts - shift.reshape(b, n, 1, 1, 1, 3, 1)
        intrins = intrins[..., :3, :3]
    combine = rots @ jnp.linalg.inv(intrins)
    pts = (combine.reshape(b, n, 1, 1, 1, 3, 3) @ pts)[..., 0]
    return pts + trans.reshape(b, n, 1, 1, 1, 3)


def convert_depth_map_to_points(
    depth: jnp.ndarray,
    input_size: Tuple[int, int],
    downsample: int,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    decoration_img: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, N_cam, D, H, W) depth -> (B, N*D*H*W, 3[+3]) ego-frame points
    (reference :62-80; batch index is implied by the leading axis here -
    static shapes instead of the reference's flattened batch_ix column)."""
    frustum = create_frustum(depth, input_size, downsample)
    geom = get_geometry(frustum, rots, trans, intrins, post_rots, post_trans)
    if decoration_img is not None:
        b, n_cam, d, h, w, _ = geom.shape
        deco = jnp.broadcast_to(
            decoration_img.reshape(b, n_cam, 1, h, w, 3), (b, n_cam, d, h, w, 3)
        )
        geom = jnp.concatenate([geom, deco], axis=-1)
    b = geom.shape[0]
    return geom.reshape(b, -1, geom.shape[-1])


def project_lidar_to_cam(
    pts: jnp.ndarray,
    rots: jnp.ndarray,
    trans: jnp.ndarray,
    intrins: jnp.ndarray,
    post_rots: jnp.ndarray,
    post_trans: jnp.ndarray,
    height: int,
    width: int,
    max_depth: float = 1e9,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project ego-frame lidar points into each camera.

    pts (P, 3+), rots/trans (N_cam, 3, 3)/(N_cam, 3) cam->ego.
    Returns (uv (N_cam, P, 2), depth (N_cam, P), valid (N_cam, P)) - the
    masked static-shape form of reference project_lidar_to_cam.py:6-63
    (which drops invalid rows dynamically).
    """
    inv_rots = jnp.linalg.inv(rots)  # ego->cam
    cam_pts = jnp.einsum("nij,pj->npi", inv_rots, pts[:, :3]) - jnp.einsum(
        "nij,nj->ni", inv_rots, trans
    )[:, None, :]
    depth = cam_pts[..., 2]
    uvw = jnp.einsum("nij,npj->npi", intrins[..., :3, :3], cam_pts)
    uv = uvw[..., :2] / jnp.where(jnp.abs(uvw[..., 2:]) < 1e-9, 1e-9, uvw[..., 2:])
    uv = jnp.einsum("ij,npj->npi", post_rots[:2, :2], uv) + post_trans[:2]
    valid = (
        (depth > 0)
        & (depth <= max_depth)
        & (uv[..., 0] >= 0) & (uv[..., 0] < width)
        & (uv[..., 1] >= 0) & (uv[..., 1] < height)
        & jnp.all(jnp.isfinite(uv), axis=-1)
    )
    uv = jnp.where(valid[..., None], uv, 0.0)
    return uv, depth, valid
