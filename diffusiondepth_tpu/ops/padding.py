"""Adaptive padding + generic conv patch embedding (backbone utils).

Equivalents of the reference's mmcv-derived helpers
(src/model/backbone/utils.py): ``AdaptivePadding`` with 'same' (split
evenly) and 'corner' (bottom/right) modes (:1-90), the generic ``PatchEmbed``
(:91-200), and the Swin-flavoured ``PatchEmbedSwin`` (:201-302) that pads to
a patch multiple and records the padded grid. The Swin backbone inlines the
'corner' behaviour; these standalone forms serve custom backbones.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn


def _pair(v) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def adaptive_pad(
    x: jnp.ndarray,
    kernel_size: Union[int, Tuple[int, int]],
    stride: Union[int, Tuple[int, int]] = 1,
    dilation: Union[int, Tuple[int, int]] = 1,
    mode: str = "corner",
) -> jnp.ndarray:
    """Pad NHWC input so a VALID conv covers it fully (reference
    AdaptivePadding.forward). 'corner' pads bottom/right only; 'same' splits
    the pad evenly (extra pixel at bottom/right like torch)."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    dh, dw = _pair(dilation)
    h, w = x.shape[1], x.shape[2]

    oh = -(-h // sh)
    ow = -(-w // sw)
    pad_h = max((oh - 1) * sh + (kh - 1) * dh + 1 - h, 0)
    pad_w = max((ow - 1) * sw + (kw - 1) * dw + 1 - w, 0)
    if pad_h == 0 and pad_w == 0:
        return x
    if mode == "corner":
        pads = ((0, 0), (0, pad_h), (0, pad_w), (0, 0))
    elif mode == "same":
        pads = (
            (0, 0),
            (pad_h // 2, pad_h - pad_h // 2),
            (pad_w // 2, pad_w - pad_w // 2),
            (0, 0),
        )
    else:
        raise ValueError(mode)
    return jnp.pad(x, pads)


class PatchEmbed(nn.Module):
    """Generic conv patch embedding with adaptive padding
    (reference utils.py PatchEmbed :91-200)."""

    embed_dims: int = 768
    kernel_size: int = 16
    stride: Optional[int] = None
    dilation: int = 1
    pad_mode: str = "corner"
    use_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        stride = self.stride or self.kernel_size
        x = adaptive_pad(x, self.kernel_size, stride, self.dilation, self.pad_mode)
        x = nn.Conv(
            self.embed_dims,
            _pair(self.kernel_size),
            strides=_pair(stride),
            kernel_dilation=_pair(self.dilation),
            padding="VALID",
            dtype=self.dtype,
            name="projection",
        )(x)
        if self.use_norm:
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return x
