"""Flax module wrappers for the deformable-conv op family.

Parity surface for the reference's ``deformconv/modules``
(src/model/deformconv/modules/deform_conv.py:14,66 ``DeformConv(Pack)``,
modules/modulated_deform_conv.py ``ModulatedDeformConv(Pack)``,
modules/deform_psroi_pooling.py ``DeformRoIPooling(Pack)``): the *Pack
variants learn their own offset (and mask) from the input with an extra
conv, zero-initialised so they start as plain convs.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from .deform_conv import deform_conv, deform_psroi_pooling, modulated_deform_conv


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer taking externally-computed offset/mask
    (reference modules/modulated_deform_conv.py)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    use_bias: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, offset, mask):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return modulated_deform_conv(
            x, offset, mask, kernel, bias, self.strides, self.padding,
            self.dilation, self.groups, self.deformable_groups,
        )


class ModulatedDeformConvPack(ModulatedDeformConv):
    """DCNv2 that learns offset+mask from its input with a zero-init conv —
    starts exactly as a dense conv (the property the reference's gradcheck
    harness exploits, deformconv/test.py:142)."""

    @nn.compact
    def __call__(self, x):  # type: ignore[override]
        k = self.kernel_size
        K = k * k
        dg = self.deformable_groups
        conv_offset = nn.Conv(
            dg * 3 * K, (k, k), strides=(self.strides,) * 2,
            padding=((self.padding,) * 2,) * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset",
        )(x)
        o1 = conv_offset[..., : dg * K]
        o2 = conv_offset[..., dg * K : dg * 2 * K]
        mask = nn.sigmoid(conv_offset[..., dg * 2 * K :])
        # interleave to per-tap (dy, dx) pairs
        b, ho, wo, _ = o1.shape
        offset = jnp.stack(
            [o1.reshape(b, ho, wo, dg * K), o2.reshape(b, ho, wo, dg * K)],
            axis=-1,
        ).reshape(b, ho, wo, dg * K * 2)
        return ModulatedDeformConv.__call__(self, x, offset, mask)


class DeformConv(nn.Module):
    """DCN v1 layer (reference modules/deform_conv.py:14)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, offset):
        k = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1] // self.groups, self.features),
        )
        return deform_conv(
            x, offset, kernel, None, self.strides, self.padding,
            self.dilation, self.groups, self.deformable_groups,
        )


class DeformConvPack(DeformConv):
    """DCN v1 with learned offsets (reference modules/deform_conv.py:66)."""

    @nn.compact
    def __call__(self, x):  # type: ignore[override]
        k = self.kernel_size
        K = k * k
        dg = self.deformable_groups
        offset = nn.Conv(
            dg * 2 * K, (k, k), strides=(self.strides,) * 2,
            padding=((self.padding,) * 2,) * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv_offset",
        )(x)
        return DeformConv.__call__(self, x, offset)


class DeformRoIPooling(nn.Module):
    """Deformable PS-RoI pooling (reference modules/deform_psroi_pooling.py:13)."""

    out_size: int
    spatial_scale: float = 1.0
    sampling_ratio: int = 2
    gamma: float = 0.1

    @nn.compact
    def __call__(self, x, rois, offset=None):
        return deform_psroi_pooling(
            x, rois, offset, self.out_size, self.spatial_scale,
            self.sampling_ratio, self.gamma,
        )


class DeformRoIPoolingPack(DeformRoIPooling):
    """Learns per-part offsets from a first (offset-free) pooling pass
    (reference modules/deform_psroi_pooling.py:50)."""

    hidden: int = 256

    @nn.compact
    def __call__(self, x, rois):  # type: ignore[override]
        pooled = DeformRoIPooling.__call__(self, x, rois, None)
        r = pooled.shape[0]
        flat = pooled.reshape(r, -1)
        h = nn.relu(nn.Dense(self.hidden, name="offset_fc1")(flat))
        off = nn.Dense(
            self.out_size * self.out_size * 2,
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="offset_fc2",
        )(h)
        off = off.reshape(r, self.out_size, self.out_size, 2)
        return DeformRoIPooling.__call__(self, x, rois, off)
