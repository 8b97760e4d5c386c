"""MPViT (Multi-Path Vision Transformer) backbone, NHWC / TPU-native.

Re-implements the reference's MPViT (src/model/backbone/mpvit.py:601-730)
with identical math but idiomatic JAX:

  * conv stem: two 3x3 Conv+BN+Hardswish at STRIDE 1 — the reference's
    dense-prediction quirk (src/model/backbone/mpvit.py:628-647, the
    ``stride=1, # 2`` edits), so the pyramid is [1/2, 1/4, 1/8, 1/16]
  * per-stage multi-path patch embedding: a CHAIN of depthwise-separable
    conv embeds where path k reuses path k-1's output, the first one
    strided 2 (Patch_Embed_stage, :212-238)
  * MHCAEncoder per path: shared ConvPosEnc (depthwise 3x3 residual,
    :241-259) and shared ConvRelPosEnc (per-head-group depthwise convs on V,
    multiplied by Q, :262-330) across the stage's blocks
  * FactorAtt: linear attention — softmax over keys' token axis, then
    (k^T v) followed by q @ (k^T v); pure einsums, MXU-friendly with no
    N x N attention matrix (:333-393)
  * stage aggregation: concat[InvRes(conv path), attention paths] -> 1x1
    Conv+BN+Hardswish (MHCA_stage, :535-583)

Factorized attention is O(N * Ch^2) — on TPU this is two batched matmuls,
so no custom kernel is needed; XLA fuses the softmax into the first one.

Variants (reference :743-870): tiny/xsmall/small/base. The default path uses
``mpvit_small`` (paths [2,3,3,3], layers [1,3,6,3], dims [64,128,216,288],
stage outputs [128,216,288,288]).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...registry import BACKBONES
from ..common import BatchNorm, drop_path


def hardswish(x: jnp.ndarray) -> jnp.ndarray:
    return x * jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


class ConvBN(nn.Module):
    """Conv2d(bias=False) + BN [+ activation] (reference Conv2d_BN :85-122)."""

    features: int
    kernel: int = 1
    stride: int = 1
    pad: int = 0
    groups: int = 1
    act: bool = False  # Hardswish when True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.pad, self.pad), (self.pad, self.pad)),
            feature_group_count=self.groups,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        return hardswish(x) if self.act else x


class DWCPatchEmbed(nn.Module):
    """Depthwise-separable conv patch embed: dw k3 + pw 1x1 + BN + Hardswish
    (reference DWConv2d_BN / DWCPatchEmbed :125-209)."""

    features: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            feature_group_count=self.features,
            use_bias=False,
            dtype=self.dtype,
            name="dwconv",
        )(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pwconv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, train)
        return hardswish(x)


class ConvPosEnc(nn.Module):
    """Conditional positional encoding: x + depthwise3x3(x) on the grid
    (reference ConvPosEnc :241-259). Operates on NHWC maps directly."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.dim, dtype=self.dtype, name="proj",
        )(x)
        return x + y


class ConvRelPosEnc(nn.Module):
    """Convolutional relative position encoding (reference :262-330).

    Heads are split into groups; each group's V-map gets its own depthwise
    conv (windows 3/5/7), then EV = Q * conv(V) elementwise.
    q, v: (B, H, W, heads, Ch). Returns same shape.
    """

    head_ch: int
    num_heads: int
    window: Any = None  # dict {window: head_split}

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, v: jnp.ndarray):
        window = self.window or {3: 2, 5: 3, 7: 3}
        assert sum(window.values()) == self.num_heads
        b, h, w, heads, ch = v.shape
        # head-major channel layout, matching the reference's
        # "B h (H W) Ch -> B (h Ch) H W" rearrange (:318)
        v_img = v.reshape(b, h, w, heads * ch)

        conv_outs = []
        start = 0
        for i, (win, split) in enumerate(window.items()):
            c = split * ch
            part = v_img[..., start : start + c]
            start += c
            pad = win // 2
            part = nn.Conv(
                c, (win, win), padding=((pad, pad), (pad, pad)),
                feature_group_count=c, dtype=self.dtype, name=f"conv_{i}",
            )(part)
            conv_outs.append(part)
        conv_v = jnp.concatenate(conv_outs, axis=-1).reshape(b, h, w, heads, ch)
        return q * conv_v


class FactorAttConvRelPosEnc(nn.Module):
    """Factorized (linear) attention + conv relative position encoding
    (reference FactorAtt_ConvRelPosEnc :333-393). Token axis stays the
    (H, W) grid; all contractions are einsums on the MXU."""

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, crpe: ConvRelPosEnc):
        b, h, w, c = x.shape
        heads = self.num_heads
        ch = c // heads
        scale = self.qk_scale or ch ** -0.5

        qkv = nn.Dense(c * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(b, h, w, 3, heads, ch)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]

        # softmax over the token axis of K (reference :372), in f32
        k = k.reshape(b, h * w, heads, ch)
        k_sm = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(x.dtype)
        v_flat = v.reshape(b, h * w, heads, ch)
        q_flat = q.reshape(b, h * w, heads, ch)

        kv = jnp.einsum("bnhk,bnhv->bhkv", k_sm, v_flat)
        factor = jnp.einsum("bnhk,bhkv->bnhv", q_flat, kv)
        factor = factor.reshape(b, h, w, heads, ch)

        out = scale * factor + crpe(q, v)
        out = out.reshape(b, h, w, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class MHCABlock(nn.Module):
    """CPE -> LN -> FactorAtt (+DropPath residual) -> LN -> MLP (+residual)
    (reference MHCABlock :396-436)."""

    dim: int
    num_heads: int = 8
    mlp_ratio: int = 3
    drop_path_rate: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, cpe: ConvPosEnc, crpe: ConvRelPosEnc, train: bool):
        x = cpe(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = FactorAttConvRelPosEnc(
            dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
            name="factoratt_crpe",
        )(y, crpe)
        if train and self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, False, self.make_rng("dropout"))
        x = x + y

        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        if train and self.drop_path_rate > 0:
            y = drop_path(y, self.drop_path_rate, False, self.make_rng("dropout"))
        return x + y


class MHCAEncoder(nn.Module):
    """A path's transformer encoder: shared CPE/CRPE over `num_layers` blocks
    (reference MHCAEncoder :439-479)."""

    dim: int
    num_layers: int = 1
    num_heads: int = 8
    mlp_ratio: int = 3
    drop_path_list: Sequence[float] = ()
    dtype: Optional[Any] = None

    def setup(self):
        self.cpe = ConvPosEnc(self.dim, dtype=self.dtype)
        self.crpe = ConvRelPosEnc(
            head_ch=self.dim // self.num_heads, num_heads=self.num_heads,
            dtype=self.dtype,
        )
        self.blocks = [
            MHCABlock(
                dim=self.dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                drop_path_rate=(
                    self.drop_path_list[i] if i < len(self.drop_path_list) else 0.0
                ),
                dtype=self.dtype,
                name=f"block{i}",
            )
            for i in range(self.num_layers)
        ]

    def __call__(self, x, train: bool = False):
        for blk in self.blocks:
            x = blk(x, self.cpe, self.crpe, train)
        return x


class ResBlock(nn.Module):
    """Inverted-residual conv block on the stage's first path
    (reference ResBlock :482-532)."""

    features: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.features, 1, act=True, dtype=self.dtype, name="conv1")(x, train)
        y = nn.Conv(
            self.features, (3, 3), padding=((1, 1), (1, 1)),
            feature_group_count=self.features, use_bias=False,
            dtype=self.dtype, name="dwconv",
        )(y)
        y = BatchNorm(dtype=self.dtype, name="norm")(y, train)
        y = hardswish(y)
        y = ConvBN(self.features, 1, act=False, dtype=self.dtype, name="conv2")(y, train)
        return x + y


class MPViT(nn.Module):
    """Multi-path ViT backbone returning a 4-level NHWC pyramid at
    [1/2, 1/4, 1/8, 1/16] of the input (reference MPViT :601-730;
    shape doc :890)."""

    num_stages: int = 4
    num_layers: Sequence[int] = (1, 1, 1, 1)
    mlp_ratios: Sequence[int] = (8, 8, 4, 4)
    num_path: Sequence[int] = (4, 4, 4, 4)
    embed_dims: Sequence[int] = (64, 128, 256, 512)
    num_heads: Sequence[int] = (8, 8, 8, 8)
    drop_path_rate: float = 0.0
    # Reference trains MPViT with every BatchNorm FROZEN (train() override
    # forcing _BatchNorm.eval(), mpvit.py:732-740, default norm_eval=True):
    # running statistics are used for normalisation and never updated, even
    # under train=True. DropPath stays training-active.
    norm_eval: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        dims = self.embed_dims
        # BN train flag: frozen when norm_eval (see field docstring)
        bn_train = train and not self.norm_eval
        # stem at stride 1 (dense-prediction quirk, reference :628-647)
        x = ConvBN(dims[0] // 2, 3, 1, 1, act=True, dtype=self.dtype,
                   name="stem0")(x, bn_train)
        x = ConvBN(dims[0], 3, 1, 1, act=True, dtype=self.dtype,
                   name="stem1")(x, bn_train)

        dpr_all = np.linspace(0, self.drop_path_rate, sum(self.num_layers)).tolist()

        outs = []
        cur = 0
        for s in range(self.num_stages):
            dpr = tuple(dpr_all[cur : cur + self.num_layers[s]])
            cur += self.num_layers[s]
            out_dim = dims[s + 1] if s + 1 < self.num_stages else dims[s]

            # chained multi-path patch embeds; first strided
            # (reference Patch_Embed_stage.forward :232-238)
            att_inputs = []
            for p in range(self.num_path[s]):
                x = DWCPatchEmbed(
                    dims[s], stride=2 if p == 0 else 1, dtype=self.dtype,
                    name=f"stage{s}_patch_embed{p}",
                )(x, bn_train)
                att_inputs.append(x)

            # parallel paths + conv path, aggregated by 1x1 conv
            # (reference MHCA_stage.forward :572-583)
            path_outs = [
                ResBlock(dims[s], dtype=self.dtype, name=f"stage{s}_invres")(
                    att_inputs[0], bn_train
                )
            ]
            for p, inp in enumerate(att_inputs):
                path_outs.append(
                    MHCAEncoder(
                        dim=dims[s],
                        num_layers=self.num_layers[s],
                        num_heads=self.num_heads[s],
                        mlp_ratio=self.mlp_ratios[s],
                        drop_path_list=dpr,
                        dtype=self.dtype,
                        name=f"stage{s}_mhca{p}",
                    )(inp, train)
                )
            x = ConvBN(out_dim, 1, act=True, dtype=self.dtype,
                       name=f"stage{s}_aggregate")(
                jnp.concatenate(path_outs, axis=-1), bn_train
            )
            outs.append(x)
        return outs


def _mpvit(paths, layers, dims, mlp, dprate, dtype=None):
    return MPViT(
        num_stages=4,
        num_path=tuple(paths),
        num_layers=tuple(layers),
        embed_dims=tuple(dims),
        mlp_ratios=tuple(mlp),
        num_heads=(8, 8, 8, 8),
        drop_path_rate=dprate,
        dtype=dtype,
    )


@BACKBONES.register(name="mpvit_tiny")
def mpvit_tiny(dtype=None):
    """Reference :743-772 (stage outputs [96, 176, 216, 216])."""
    return _mpvit([2, 3, 3, 3], [1, 2, 4, 1], [64, 96, 176, 216], [2] * 4, 0.0, dtype)


@BACKBONES.register(name="mpvit_xsmall")
def mpvit_xsmall(dtype=None):
    """Reference :775-804 (stage outputs [128, 192, 256, 256])."""
    return _mpvit([2, 3, 3, 3], [1, 2, 4, 1], [64, 128, 192, 256], [4] * 4, 0.0, dtype)


@BACKBONES.register(name="mpvit_small")
def mpvit_small(dtype=None):
    """Default-path variant (reference :807-836; head channels
    [128, 216, 288, 288] match ..._mpvit_HAHI.py:32)."""
    return _mpvit([2, 3, 3, 3], [1, 3, 6, 3], [64, 128, 216, 288], [4] * 4, 0.2, dtype)


@BACKBONES.register(name="mpvit_base")
def mpvit_base(dtype=None):
    """Reference :839-870 (stage outputs [224, 368, 480, 480])."""
    return _mpvit([2, 3, 3, 3], [1, 3, 8, 3], [128, 224, 368, 480], [4] * 4, 0.4, dtype)
