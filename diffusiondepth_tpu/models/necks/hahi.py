"""HAHI heterogeneous feature enhancement neck (DepthFormer).

Re-implements the reference HAHIHeteroNeck (src/model/necks/hahi.py:16-275):

  * lateral 1x1 conv+BN+ReLU per level
  * levels 1..n-1 ("transformer" levels): project to embedding_dim, flatten,
    optional deformable SELF-attention over the concatenated multi-scale
    tokens, re-fold, concat with the projected level, 3x3 fusion conv
  * level 0 ("conv" level): project to embedding_dim, optional deformable
    CROSS-attention from its tokens into the fused multi-scale tokens,
    concat with the projected level, 3x3 fusion conv

The shipped Swin/MPViT configs construct HAHI with self_att=False,
cross_att=False (reference ddim_depth_estimate_res_swin_addHAHI.py:54-56), so
both attentions are bypassed (hahi.py:222-223,246-247) and the neck
degenerates to per-level conv projections + fusion - that path is exact here.
The attention path is functional through our TPU-native MSDA (the reference's
would crash: its MSDA is configured for 4 levels but fed 3).

All maps NHWC. Attention modules and the reference-points Linear are only
constructed when enabled, keeping the bypassed configs lean; the checkpoint
converter tolerates the reference's dormant attention weights.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...ops.msda import MultiScaleDeformableAttention
from ...registry import NECKS
from ..common import BatchNorm
from .positional_encoding import sine_positional_encoding


class _ConvBNReLU(nn.Module):
    features: int
    kernel: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding=((p, p), (p, p)), dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, train)
        return nn.relu(x)


def _grid_reference_points(spatial_shapes) -> np.ndarray:
    """Per-token normalized center coords across levels, concatenated
    (reference hahi.py:151-163 with all-valid masks -> valid_ratios == 1)."""
    pts = []
    for (h, w) in spatial_shapes:
        ys = (np.arange(h, dtype=np.float32) + 0.5) / h
        xs = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    return np.concatenate(pts, 0)  # (sum HW, 2)


@NECKS.register_module()
class HAHIHeteroNeck(nn.Module):
    in_channels: Sequence[int] = (192, 384, 768, 1536)
    out_channels: Sequence[int] = (192, 384, 768, 1536)
    embedding_dim: int = 512
    scales: Sequence[int] = (1, 1, 1, 1)
    self_att: bool = False
    cross_att: bool = False
    num_points: int = 8
    num_heads: int = 8
    pe_num_feats: int = 256
    dtype: Optional[Any] = None

    def setup(self):
        n = len(self.in_channels)
        self.lateral_convs = [
            _ConvBNReLU(self.out_channels[i], 1, dtype=self.dtype,
                        name=f"lateral_{i}")
            for i in range(n)
        ]
        self.trans_proj = [
            _ConvBNReLU(self.embedding_dim, 1, dtype=self.dtype,
                        name=f"trans_proj_{i}")
            for i in range(n - 1)
        ]
        self.trans_fusion = [
            _ConvBNReLU(self.out_channels[i + 1], 3, dtype=self.dtype,
                        name=f"trans_fusion_{i}")
            for i in range(n - 1)
        ]
        self.conv_proj = _ConvBNReLU(self.embedding_dim, 1, dtype=self.dtype)
        self.conv_fusion = _ConvBNReLU(self.out_channels[0], 3, dtype=self.dtype)

        if self.self_att or self.cross_att:
            self.level_embed = self.param(
                "level_embed",
                nn.initializers.normal(1.0),
                (4, self.embedding_dim),  # 4 level slots as in the reference
            )
        if self.self_att:
            self.self_attn = MultiScaleDeformableAttention(
                embed_dims=self.embedding_dim, num_heads=self.num_heads,
                num_levels=4, num_points=self.num_points, dtype=self.dtype,
            )
        if self.cross_att:
            self.reference_points_fc = nn.Dense(2, dtype=self.dtype)
            self.multi_att = MultiScaleDeformableAttention(
                embed_dims=self.embedding_dim, num_heads=self.num_heads,
                num_levels=4, num_points=self.num_points, dtype=self.dtype,
            )

    def __call__(self, inputs: Sequence[jnp.ndarray], train: bool = False):
        assert len(inputs) == len(self.in_channels)
        n = len(inputs)

        feats_projed = [
            self.lateral_convs[i](inputs[i], train) for i in range(n)
        ]
        feat_conv = feats_projed[0]
        feats_trans = feats_projed[1:]

        spatial_shapes = tuple((f.shape[1], f.shape[2]) for f in feats_trans)
        b = feat_conv.shape[0]

        # flatten trans levels to tokens
        srcs = []
        for i, f in enumerate(feats_trans):
            proj = self.trans_proj[i](f, train)
            srcs.append(proj.reshape(b, -1, self.embedding_dim))
        src = jnp.concatenate(srcs, axis=1)  # (B, sum HW, E)

        # HI: deformable self-attention over multi-scale tokens
        if self.self_att:
            pos = []
            for i, (h, w) in enumerate(spatial_shapes):
                pe = sine_positional_encoding(h, w, self.pe_num_feats)
                pe = jnp.asarray(pe.reshape(1, h * w, -1), src.dtype)
                pos.append(pe + self.level_embed[i][None, None].astype(src.dtype))
            lvl_pos = jnp.concatenate(pos, axis=1)
            ref = jnp.asarray(_grid_reference_points(spatial_shapes), src.dtype)
            ref = jnp.broadcast_to(
                ref[None, :, None, :], (b, ref.shape[0], len(spatial_shapes), 2)
            )
            src = self.self_attn(
                src, None, lvl_pos, ref, spatial_shapes, train=train
            )

        # HA: deformable cross-attention from level-0 tokens into fused tokens
        conv_skip = self.conv_proj(feat_conv, train)
        h0, w0 = conv_skip.shape[1], conv_skip.shape[2]
        query = conv_skip.reshape(b, h0 * w0, self.embedding_dim)
        if self.cross_att:
            qpe = jnp.asarray(
                sine_positional_encoding(h0, w0, self.pe_num_feats)
                .reshape(1, h0 * w0, -1),
                query.dtype,
            )
            qpe = jnp.broadcast_to(qpe, query.shape)
            ref = nn.sigmoid(self.reference_points_fc(qpe))
            ref = jnp.broadcast_to(
                ref[:, :, None, :], (b, h0 * w0, len(spatial_shapes), 2)
            )
            fusion_res_conv = self.multi_att(
                query, src, qpe, ref, spatial_shapes, train=train
            )
        else:
            fusion_res_conv = query

        fusion_res_conv = fusion_res_conv.reshape(b, h0, w0, self.embedding_dim)
        out0 = self.conv_fusion(
            jnp.concatenate([fusion_res_conv, feat_conv], axis=-1), train
        )

        # unfold tokens back and fuse per trans level
        outs = [out0]
        start = 0
        for i, (h, w) in enumerate(spatial_shapes):
            tok = src[:, start : start + h * w].reshape(b, h, w, self.embedding_dim)
            start += h * w
            fused = jnp.concatenate([feats_trans[i], tok], axis=-1)
            outs.append(self.trans_fusion[i](fused, train))
        return tuple(outs)
