"""mmbev-style stemless ResNet backbone (NHWC).

Re-implements ``ResNetForMMBEV`` (reference:
src/model/backbone/mmbev_resnet.py:102-160): four stages of mmdet
BasicBlock/Bottleneck applied directly to the RGB input (no 7x7 stem), strides
[2,2,2,2], channels [64,128,256,512], returning all four pyramid levels
(H/2 .. H/16; shape doc reference :214-222). Downsample branches are plain
3x3 strided convs WITH bias and no BN (reference :119,129 - an mmbev quirk,
not torchvision's 1x1+BN).

Variants: mmbev_res18 / res50 / res101 (reference :176-194), plus the CBAM
block type (reference :16-98).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.cbam import CBAMWithPosEmbed
from ...registry import BACKBONES
from ..common import BatchNorm


class BasicBlock(nn.Module):
    """mmdet BasicBlock: 3x3(s)+BN+ReLU -> 3x3+BN, residual, ReLU."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(BatchNorm(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype)(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)), use_bias=True,
                               dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class BasicBlockWithCBAM(nn.Module):
    """BasicBlock with CBAM applied to the residual branch (reference :70-98)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(BatchNorm(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype)(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)), use_bias=True,
                               dtype=self.dtype, name="downsample")(x)
        out = CBAMWithPosEmbed(pos_embed_planes=min(self.planes, 16),
                               dtype=self.dtype)(out, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """mmdet Bottleneck (style='pytorch'): 1x1 -> 3x3(s) -> 1x1(x4)."""

    planes: int  # bottleneck width; output channels = planes * 4
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(BatchNorm(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(out)
        out = nn.relu(BatchNorm(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype)(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes * 4, (3, 3),
                               strides=(self.stride, self.stride),
                               padding=((1, 1), (1, 1)), use_bias=True,
                               dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


_BLOCKS = {
    "Basic": BasicBlock,
    "BottleNeck": Bottleneck,
    "BasicBlockWithCBAM": BasicBlockWithCBAM,
}


class ResNetForMMBEV(nn.Module):
    num_layer: Sequence[int] = (2, 2, 2, 2)
    num_channels: Sequence[int] = (64, 128, 256, 512)
    stride: Sequence[int] = (2, 2, 2, 2)
    block_type: str = "Basic"
    backbone_output_ids: Optional[Sequence[int]] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        block_cls = _BLOCKS[self.block_type]
        out_ids = (
            range(len(self.num_layer))
            if self.backbone_output_ids is None
            else self.backbone_output_ids
        )
        feats = []
        for i, (n, ch, s) in enumerate(zip(self.num_layer, self.num_channels, self.stride)):
            planes = ch // 4 if self.block_type == "BottleNeck" else ch
            x = block_cls(planes, stride=s, downsample=True, dtype=self.dtype,
                          name=f"layer{i}_block0")(x, train)
            for b in range(1, n):
                x = block_cls(planes, dtype=self.dtype,
                              name=f"layer{i}_block{b}")(x, train)
            if i in out_ids:
                feats.append(x)
        return feats


@BACKBONES.register(name="mmbev_res18")
def mmbev_res18(dtype=None):
    return ResNetForMMBEV(num_layer=(2, 2, 2, 2), block_type="Basic", dtype=dtype)


@BACKBONES.register(name="mmbev_res50")
def mmbev_res50(dtype=None):
    # NOTE: the reference builds res50/res101 with *Basic* blocks, not
    # bottlenecks (mmbev quirk, reference :183-194) - preserved faithfully.
    return ResNetForMMBEV(num_layer=(3, 4, 6, 3), block_type="Basic", dtype=dtype)


@BACKBONES.register(name="mmbev_res101")
def mmbev_res101(dtype=None):
    return ResNetForMMBEV(num_layer=(3, 4, 23, 3), block_type="Basic", dtype=dtype)
