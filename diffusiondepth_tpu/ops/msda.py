"""Multi-scale deformable attention (MSDA), TPU-native.

Replaces mmcv's compiled CUDA ``MultiScaleDeformableAttention`` op (imported
by the reference HAHI neck, src/model/necks/hahi.py:10,109-118). The core is
per-query bilinear sampling at ``reference_points + learned offsets`` across
multiple feature levels, weighted by learned attention - implemented here as
an XLA gather-based composition with static shapes (a Pallas gather-attend
kernel can swap in transparently later; sampling patterns are fully static
per config).

Math follows mmcv's ``multi_scale_deformable_attn_pytorch`` exactly:
grid_sample(bilinear, zeros padding, align_corners=False).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def bilinear_sample_nhwc(
    img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample with zeros padding (grid_sample align_corners=False).

    img: (B, H, W, C); x, y: (B, Q) pixel-space coords (can be out of range).
    Returns (B, Q, C).
    """
    b, h, w, c = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    flat = img.reshape(b, h * w, c)

    def corner(xi, yi, wxi, wyi):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yc * w + xc  # (B, Q)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, Q, C)
        wgt = (wxi * wyi) * valid.astype(img.dtype)
        return vals * wgt[..., None]

    return (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Core MSDA (mmcv multi_scale_deformable_attn_pytorch semantics).

    value: (B, Nv, heads, d) - levels concatenated along Nv
    spatial_shapes: static list of (H_l, W_l)
    sampling_locations: (B, Nq, heads, L, P, 2) normalized to [0, 1]
    attention_weights: (B, Nq, heads, L, P), softmaxed over L*P
    Returns (B, Nq, heads * d).
    """
    b, nv, heads, d = value.shape
    _, nq, _, L, P, _ = sampling_locations.shape
    assert L == len(spatial_shapes)

    out = jnp.zeros((b, nq, heads, d), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        val_l = value[:, start : start + h * w]  # (B, HW, heads, d)
        start += h * w
        # (B*heads, H, W, d)
        img = val_l.transpose(0, 2, 1, 3).reshape(b * heads, h, w, d)
        loc = sampling_locations[:, :, :, lvl]  # (B, Nq, heads, P, 2)
        # grid_sample align_corners=False: pix = ((2*loc-1)+1)*size/2 - 0.5
        px = loc[..., 0] * w - 0.5
        py = loc[..., 1] * h - 0.5
        px = px.transpose(0, 2, 1, 3).reshape(b * heads, nq * P)
        py = py.transpose(0, 2, 1, 3).reshape(b * heads, nq * P)
        sampled = bilinear_sample_nhwc(img, px, py)  # (B*heads, Nq*P, d)
        sampled = sampled.reshape(b, heads, nq, P, d)
        wgt = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B,heads,Nq,P)
        out = out + jnp.einsum("bhqpd,bhqp->bqhd", sampled, wgt)
    return out.reshape(b, nq, heads * d)


def _msda_offset_bias_init(num_heads: int, num_levels: int, num_points: int):
    """mmcv's rotational-grid bias init for sampling_offsets."""
    thetas = np.arange(num_heads, dtype=np.float32) * (2.0 * np.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (heads, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, num_levels, num_points, 1))
    scale = np.arange(1, num_points + 1, dtype=np.float32)[None, None, :, None]
    grid = grid * scale
    flat = grid.reshape(-1)

    def init(key, shape, dtype=jnp.float32):
        del key
        assert shape == flat.shape, (shape, flat.shape)
        return jnp.asarray(flat, dtype)

    return init


class MultiScaleDeformableAttention(nn.Module):
    """mmcv-compatible MSDA layer (value/output projections, learned offsets
    and attention weights, residual + dropout).

    The projection sizes use ``num_levels`` (matching reference checkpoints,
    which size them for 4 levels) while the runtime level count comes from
    ``spatial_shapes`` - extra level slots are sliced off. (The reference's
    attention-on path would crash on this mismatch; see SURVEY.md 2.3 HAHI
    note - the shipped configs bypass attention entirely.)
    """

    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 4
    dropout: float = 0.1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Nq, C)
        value: Optional[jnp.ndarray],  # (B, Nv, C) or None (self-attention)
        query_pos: Optional[jnp.ndarray],
        reference_points: jnp.ndarray,  # (B, Nq, L, 2) in [0,1]
        spatial_shapes: Sequence[Tuple[int, int]],
        identity: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        if value is None:
            value = query
        if identity is None:
            identity = query
        if query_pos is not None:
            query = query + query_pos

        b, nq, c = query.shape
        nv = value.shape[1]
        heads, L_cfg, P = self.num_heads, self.num_levels, self.num_points
        L = len(spatial_shapes)
        d = c // heads

        v = nn.Dense(self.embed_dims, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(b, nv, heads, d)

        offsets = nn.Dense(
            heads * L_cfg * P * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=_msda_offset_bias_init(heads, L_cfg, P),
            dtype=self.dtype,
            name="sampling_offsets",
        )(query).reshape(b, nq, heads, L_cfg, P, 2)[:, :, :, :L]

        # mmcv softmaxes over ALL configured L_cfg*P slots (mmcv
        # multi_scale_deform_attn.py MultiScaleDeformableAttention.forward)
        # and only then uses the per-level slices; when runtime L < L_cfg the
        # used weights therefore sum to < 1.  Softmax first, slice after.
        # NOTE: mmcv itself ERRORS outright when runtime L != its configured
        # num_levels (value_spatial_shapes assert), so the L < L_cfg case has
        # no runnable reference behavior — this is an extrapolation of mmcv's
        # op ORDER to that config, not measured parity (at L == L_cfg, the
        # only runnable case, the two are exact).
        attn = nn.Dense(
            heads * L_cfg * P,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="attention_weights",
        )(query)
        attn = jax.nn.softmax(
            attn.reshape(b, nq, heads, L_cfg * P).astype(jnp.float32), axis=-1
        ).astype(query.dtype).reshape(b, nq, heads, L_cfg, P)[:, :, :, :L]

        normalizer = jnp.asarray(
            [[w, h] for (h, w) in spatial_shapes], offsets.dtype
        )  # (L, 2) as (W, H)
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / normalizer[None, None, None, :, None, :]
        )

        out = ms_deform_attn(v, spatial_shapes, locations, attn)
        out = nn.Dense(self.embed_dims, dtype=self.dtype, name="output_proj")(out)
        if train and self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=False)(out)
        return identity + out
