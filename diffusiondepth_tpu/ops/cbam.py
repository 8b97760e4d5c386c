"""CBAM channel/spatial attention blocks (NHWC).

Re-implements the reference's CBAM ops (src/model/ops/cbam.py:11-94), used by
the optional ``BasicBlockWithCBAM`` ResNet variant
(src/model/backbone/mmbev_resnet.py:16-98).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..models.common import BatchNorm


class ChannelAttention(nn.Module):
    ratio: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        fc1 = nn.Conv(max(c // self.ratio, 1), (1, 1), use_bias=False, dtype=self.dtype)
        fc2 = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)
        avg = jnp.mean(x, axis=(1, 2), keepdims=True)
        mx = jnp.max(x, axis=(1, 2), keepdims=True)
        out = fc2(nn.relu(fc1(avg))) + fc2(nn.relu(fc1(mx)))
        return nn.sigmoid(out)


class SpatialAttention(nn.Module):
    kernel_size: int = 7
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2
        avg = jnp.mean(x, axis=-1, keepdims=True)
        mx = jnp.max(x, axis=-1, keepdims=True)
        s = jnp.concatenate([avg, mx], axis=-1)
        s = nn.Conv(1, (self.kernel_size, self.kernel_size),
                    padding=((p, p), (p, p)), use_bias=False, dtype=self.dtype)(s)
        return nn.sigmoid(s)


class CBAM(nn.Module):
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = x * ChannelAttention(dtype=self.dtype)(x)
        x = x * SpatialAttention(dtype=self.dtype)(x)
        return x


class CBAMWithPosEmbed(nn.Module):
    """CBAM on a dim-reduced feature with a learned 2-D positional MLP
    (reference: src/model/ops/cbam.py:56-94)."""

    pos_embed_planes: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h, w = x.shape[1], x.shape[2]

        # dim_reduce: conv3x3 -> BN -> ReLU
        x_r = nn.Conv(self.pos_embed_planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype)(x)
        x_r = nn.relu(BatchNorm(dtype=self.dtype)(x_r, train))

        # positional embedding: normalized (x,y) in [-0.5, 0.5) -> MLP
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        pos = jnp.stack([xx, yy], axis=-1).astype(x_r.dtype)
        pos = pos / jnp.asarray([w, h], x_r.dtype) - 0.5
        f = nn.relu(nn.Dense(8, dtype=self.dtype)(pos))
        f = nn.relu(nn.Dense(self.pos_embed_planes, dtype=self.dtype)(f))
        x_r = x_r + f[None]

        ca = ChannelAttention(dtype=self.dtype)(x_r)
        up = nn.Conv(c, (1, 1), use_bias=False, dtype=self.dtype)(ca)
        up = nn.relu(BatchNorm(dtype=self.dtype)(up, train))
        x = x * up
        x = x * SpatialAttention(dtype=self.dtype)(x_r)
        return x
