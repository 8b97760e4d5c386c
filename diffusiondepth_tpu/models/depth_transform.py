"""Depth <-> latent transforms.

Re-implements all six registered transforms of the reference
(src/model/ops/depth_transform.py:10-146). The default for every DDIM head is
``DeepDepthTransformWithUpsampling``: a learned stride-2 conv encoder with Tanh
(metric depth -> 16-channel half-resolution latent) and a deconv decoder with
Sigmoid, decoded through the reciprocal parameterisation
``depth = 1/clamp(sigmoid(.), eps) - 1`` (reference :33-35).

All modules are NHWC; ``t`` encodes depth (B,H,W,1) -> latent, ``inv_t``
decodes latent -> depth (B,H,W,1).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..registry import DEPTH_TRANSFORMS
from .common import ConvBNAct, DeconvBNAct, max_pool2d


class _InvDecodeMixin:
    """depth = 1/clamp(decoder_out, eps) - 1 (reference :35).

    Computed in float32 regardless of the compute policy: near-zero sigmoid
    outputs map to depths up to 1/eps = 1e6, far outside bf16's useful
    precision range.
    """

    def _reciprocal_decode(self, v: jnp.ndarray) -> jnp.ndarray:
        v = v.astype(jnp.float32)
        return 1.0 / jnp.clip(v, self.eps, None) - 1.0


@DEPTH_TRANSFORMS.register_module()
class DeepDepthTransformWithUpsampling(nn.Module, _InvDecodeMixin):
    """Learned stride-2 encoder / x2 deconv decoder (reference :10-35)."""

    hidden: int = 16
    eps: float = 1e-6
    dtype: Optional[Any] = None

    def setup(self):
        self.enc1 = ConvBNAct(self.hidden, 3, 2, 1, act="leaky_relu", dtype=self.dtype)
        self.enc2 = ConvBNAct(self.hidden, 3, 1, 1, act=None, dtype=self.dtype)
        self.dec_up = DeconvBNAct(self.hidden, 4, 2, act="relu", use_bias=True,
                                  dtype=self.dtype)
        self.dec_out = ConvBNAct(1, 3, 1, 1, use_bn=False, act=None, dtype=self.dtype)

    def t(self, depth: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.enc1(depth, train)
        x = self.enc2(x, train)
        return jnp.tanh(x)

    def inv_t(self, value: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = self.dec_up(value, train)
        x = nn.sigmoid(self.dec_out(x, train))
        return self._reciprocal_decode(x)

    def __call__(self, depth, train: bool = False):  # for init
        return self.inv_t(self.t(depth, train), train)


@DEPTH_TRANSFORMS.register_module()
class DeepDepthTransformWithUpsampling1x1(nn.Module, _InvDecodeMixin):
    """1x1-conv encoder + maxpool downsample variant (reference :38-64)."""

    hidden: int = 16
    eps: float = 1e-6
    dtype: Optional[Any] = None

    def setup(self):
        self.enc1 = nn.Conv(self.hidden, (1, 1), use_bias=False, dtype=self.dtype)
        self.enc2 = nn.Conv(self.hidden, (1, 1), use_bias=False, dtype=self.dtype)
        self.dec_up = DeconvBNAct(self.hidden, 4, 2, act="relu", use_bias=True,
                                  dtype=self.dtype)
        self.dec_out = ConvBNAct(1, 3, 1, 1, use_bn=False, act=None, dtype=self.dtype)

    def t(self, depth, train: bool = False):
        x = jnp.tanh(self.enc2(self.enc1(depth)))
        return max_pool2d(x, 3, 2, 1)

    def inv_t(self, value, train: bool = False):
        x = self.dec_up(value, train)
        x = nn.sigmoid(self.dec_out(x, train))
        return self._reciprocal_decode(x)

    def __call__(self, depth, train: bool = False):
        return self.inv_t(self.t(depth, train), train)


@DEPTH_TRANSFORMS.register_module()
class DeepDepthTransformWithUpsamplingX4(nn.Module, _InvDecodeMixin):
    """x4 downsampling variant (reference :67-94)."""

    hidden: int = 16
    eps: float = 1e-6
    dtype: Optional[Any] = None

    def setup(self):
        self.enc1 = ConvBNAct(self.hidden, 3, 2, 1, act="leaky_relu", dtype=self.dtype)
        self.enc2 = ConvBNAct(self.hidden, 3, 2, 1, act="leaky_relu", dtype=self.dtype)
        self.enc3 = ConvBNAct(self.hidden, 3, 1, 1, act=None, dtype=self.dtype)
        # first deconv has no BN/act in the reference Sequential (:79-82)
        self.dec_up1 = DeconvBNAct(self.hidden, 4, 2, use_bn=False, act=None,
                                   use_bias=True, dtype=self.dtype)
        self.dec_up2 = DeconvBNAct(self.hidden, 4, 2, act="relu", dtype=self.dtype)
        self.dec_out = ConvBNAct(1, 3, 1, 1, use_bn=False, act=None, dtype=self.dtype)

    def t(self, depth, train: bool = False):
        x = self.enc1(depth, train)
        x = self.enc2(x, train)
        x = self.enc3(x, train)
        return jnp.tanh(x)

    def inv_t(self, value, train: bool = False):
        x = self.dec_up1(value, train)
        x = self.dec_up2(x, train)
        x = nn.sigmoid(self.dec_out(x, train))
        return self._reciprocal_decode(x)

    def __call__(self, depth, train: bool = False):
        return self.inv_t(self.t(depth, train), train)


@DEPTH_TRANSFORMS.register_module()
class DeepDepthTransform(nn.Module, _InvDecodeMixin):
    """Non-strided (full-resolution) variant (reference :97-117)."""

    hidden: int = 16
    eps: float = 1e-6
    dtype: Optional[Any] = None

    def setup(self):
        self.enc1 = ConvBNAct(self.hidden, 3, 1, 1, act="leaky_relu", dtype=self.dtype)
        self.enc2 = ConvBNAct(self.hidden, 3, 1, 1, act=None, dtype=self.dtype)
        self.dec1 = ConvBNAct(self.hidden, 3, 1, 1, act="leaky_relu", dtype=self.dtype)
        self.dec2 = ConvBNAct(1, 3, 1, 1, act=None, dtype=self.dtype)

    def t(self, depth, train: bool = False):
        return jnp.tanh(self.enc2(self.enc1(depth, train), train))

    def inv_t(self, value, train: bool = False):
        x = nn.sigmoid(self.dec2(self.dec1(value, train), train))
        return self._reciprocal_decode(x)

    def __call__(self, depth, train: bool = False):
        return self.inv_t(self.t(depth, train), train)


@DEPTH_TRANSFORMS.register_module()
class ReciprocalDepthTransform(nn.Module):
    """Analytic reciprocal transform (reference :120-133). Parameter-free."""

    linear: tuple = (1.0, 0.0)
    eps: float = 1e-6

    def t(self, depth, train: bool = False):
        return self.linear[0] / jnp.clip(1.0 + jnp.clip(depth, 0.0, None), self.eps, None) \
            + self.linear[1]

    def inv_t(self, value, train: bool = False):
        return self.linear[0] / jnp.clip(value - self.linear[1], self.eps, None) - 1.0

    def __call__(self, depth, train: bool = False):
        return self.inv_t(self.t(depth))


@DEPTH_TRANSFORMS.register_module()
class ReciprocalDepthTransformII(nn.Module):
    """min_depth/d parameterisation (reference :136-145). Parameter-free."""

    min_depth: float = 0.5

    def t(self, depth, train: bool = False):
        return self.min_depth / jnp.clip(depth, self.min_depth, None)

    def inv_t(self, value, train: bool = False):
        return self.min_depth / value

    def __call__(self, depth, train: bool = False):
        return self.inv_t(self.t(depth))


def build_depth_transform(cfg, **kwargs) -> nn.Module:
    """Build from an mmcv-style cfg dict (reference head default:
    dict(type='DeepDepthTransformWithUpsampling', hidden=16, eps=1e-6))."""
    return DEPTH_TRANSFORMS.build(cfg, **kwargs)
