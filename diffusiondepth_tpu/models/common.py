"""Shared Flax building blocks (NHWC).

Equivalents of the reference's torch helpers: ``conv_bn_relu`` /
``convt_bn_relu`` (reference: src/model/common.py:45-82, LeakyReLU(0.2)),
mmcv ``ConvModule`` plain-conv usage, and BN-normalized deconv upsampling.

BatchNorm parity notes:
  * torch BatchNorm2d(momentum=0.1)  ==  flax BatchNorm(momentum=0.9)
    (flax uses decay convention: new = m*old + (1-m)*batch).
  * Under jit with a batch sharded over the 'data' mesh axis, the batch-mean /
    variance reductions are global - GSPMD inserts the cross-replica psum, so
    SyncBatchNorm (reference: apex convert_syncbn_model, src/main.py:128) is
    structural rather than a wrapper.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def act_fn(name: Optional[str], negative_slope: float = 0.2) -> Callable:
    if name is None:
        return lambda x: x
    if name == "relu":
        return nn.relu
    if name == "leaky_relu":
        return lambda x: nn.leaky_relu(x, negative_slope=negative_slope)
    if name == "gelu":
        return nn.gelu
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return nn.sigmoid
    raise ValueError(name)


class BatchNorm(nn.Module):
    """BatchNorm2d with torch-compatible defaults, NHWC."""

    momentum: float = 0.9  # == torch momentum 0.1
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
        )(x)


class ConvBNAct(nn.Module):
    """Conv2d [+ BatchNorm] [+ activation].

    Matches reference ``conv_bn_relu`` (src/model/common.py:45-60): bias only
    when BN is off; default activation LeakyReLU(0.2).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    strides: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bn: bool = True
    act: Optional[str] = "leaky_relu"
    negative_slope: float = 0.2
    use_bias: Optional[bool] = None  # default: not use_bn
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = _pair(self.padding)
        bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        x = nn.Conv(
            self.features,
            _pair(self.kernel_size),
            strides=_pair(self.strides),
            padding=(p, p) if isinstance(p[0], int) else p,
            use_bias=bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        return act_fn(self.act, self.negative_slope)(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose2d with torch-exact semantics and numerics.

    Implemented as ``lax.conv_general_dilated`` with lhs (input) dilation and
    the spatially-flipped kernel — verified bit-comparable to
    ``torch.nn.functional.conv_transpose2d`` in tests/test_convert_torch.py,
    so reference deconv weights convert by a pure transpose (converter rule
    ``conv_transpose_kernel``). torch padding/output_padding map to the
    asymmetric pad config ``(k-1-p, k-1-p+op)``.

    Kernel param layout: (kh, kw, in_features, out_features).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    strides: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 0  # torch-style
    output_padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        k = _pair(self.kernel_size)
        s = _pair(self.strides)
        p = _pair(self.padding)
        op = _pair(self.output_padding)
        in_features = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k[0], k[1], in_features, self.features),
        )
        dtype = self.dtype or x.dtype
        pads = tuple(
            (k[i] - 1 - p[i], k[i] - 1 - p[i] + op[i]) for i in range(2)
        )
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel[::-1, ::-1].astype(dtype),
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=s,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(dtype)
        return y


class DeconvBNAct(nn.Module):
    """ConvTranspose2d [+ BatchNorm] [+ activation].

    kernel 2 / stride 2 -> torch p=0, op=0;
    kernel 3 / stride 2 -> torch p=1, op=1 (NLSPN decoder);
    kernel 4 / stride 2 -> torch p=1, op=0 (depth-transform decoder).
    All produce exact 2x upsampling, matching the reference's
    ``build_upsample_layer(type='deconv')`` FPN usage
    (src/model/head/ddim_depth_estimate_res.py:72-84), the depth-transform
    decoder (src/model/ops/depth_transform.py:21), and NLSPN ``convt_bn_relu``
    (src/model/common.py:63-82).
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 2
    strides: Union[int, Tuple[int, int]] = 2
    use_bn: bool = True
    act: Optional[str] = "relu"
    use_bias: Optional[bool] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = _pair(self.kernel_size)
        s = _pair(self.strides)
        # torch (padding, output_padding) giving out = in * stride
        torch_pad = {2: (0, 0), 3: (1, 1), 4: (1, 0)}[k[0]]
        bias = (not self.use_bn) if self.use_bias is None else self.use_bias
        x = TorchConvTranspose(
            self.features, k, s, padding=torch_pad[0],
            output_padding=torch_pad[1], use_bias=bias, dtype=self.dtype,
            name="deconv",
        )(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype)(x, train)
        return act_fn(self.act)(x)


class GroupNorm(nn.Module):
    """torch-compatible GroupNorm (affine, eps 1e-5).

    Under the bf16 compute policy the normalization ARITHMETIC stays bf16
    while the statistics use f32-accumulating reductions. flax's nn.GroupNorm
    instead upcasts the whole activation to f32, which makes the VJP stage
    full-size f32 tensors - profiled on the flagship training step, those f32
    stagings (plus the f32 layout copies they force between GroupNorm and
    conv fusions) are a large slice of the sampler-backward's HBM traffic,
    and that backward is bandwidth-bound at ~65% of peak. Param names/shapes
    ('scale'/'bias', f32) are identical to flax's, so checkpoints are
    unaffected; the f32 path (parity tests, O0) still uses flax directly.
    """

    num_groups: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if self.dtype != jnp.bfloat16:
            return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-5,
                                dtype=self.dtype)(x)
        # name matches the flax submodule so the param tree ('GroupNorm_0/
        # {scale,bias}') is identical across dtype configurations
        return _BF16GroupNorm(self.num_groups, name="GroupNorm_0")(x)


class _BF16GroupNorm(nn.Module):
    """bf16-arithmetic GroupNorm with f32-accumulated statistics.

    Forward AND backward are hand-written (``jax.custom_vjp``): autodiff
    through the f32-accumulated statistics stages full-size f32 tensors in
    the VJP (profiled at ~26 GB/step of pure GroupNorm-backward traffic in
    the flagship 20-step sampler backward, which is bandwidth-bound). The
    analytic gradient below is the textbook GN backward
        dx = inv * (t - mean_g(t) - xhat * mean_g(t * xhat)),  t = dy * scale
    evaluated in bf16 with f32-accumulating reductions - ~5 full-size bf16
    traversals, zero full-size f32.
    """

    num_groups: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return _gn_bf16(x.astype(jnp.bfloat16), scale, bias, self.num_groups)


def _sum_spatial_f32(x2):
    """(b, n, c) bf16 -> (b, c) f32 spatial sum as a batched GEMV.

    A plain ``jnp.sum(..., dtype=f32)`` is lowered as convert-then-reduce, and
    on TPU the full-size f32 convert gets MATERIALISED whenever the reduce
    lands in a different fusion than the producer (profiled: several ~330 MB
    f32 stagings per sampler step in the flagship backward). A bf16 dot with
    a ones vector reduces on the MXU, which accumulates in f32 natively -
    identical precision, bf16-only memory traffic.
    """
    ones = jnp.ones(x2.shape[:2], jnp.bfloat16)
    return jax.lax.dot_general(
        ones,
        x2,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _gn_bf16_fwd_impl(x, scale, bias, num_groups):
    # Statistics from per-(batch, channel) f32-accumulated spatial sums, via
    # MXU dots (see _sum_spatial_f32). This scan body is replayed under remat
    # during the backward, so the forward must also avoid staging full-size
    # f32; every full-size tensor here is bf16, all f32 is (b, c)-sized.
    b, c = x.shape[0], x.shape[-1]
    cg = c // num_groups
    x2 = x.reshape(b, -1, c)
    n_group = x2.shape[1] * cg
    s1 = _sum_spatial_f32(x2).reshape(b, num_groups, cg).sum(-1)  # (b, g)
    s2 = _sum_spatial_f32(x2 * x2).reshape(b, num_groups, cg).sum(-1)
    mean = s1 / n_group
    var = jnp.maximum(s2 / n_group - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    xg = x.reshape(b, -1, num_groups, cg)
    mean4 = mean.astype(jnp.bfloat16)[:, None, :, None]
    inv4 = inv.astype(jnp.bfloat16)[:, None, :, None]
    xhat = ((xg - mean4) * inv4).reshape(x.shape)
    y = xhat * scale.astype(jnp.bfloat16) + bias.astype(jnp.bfloat16)
    return y, (xhat, inv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gn_bf16(x, scale, bias, num_groups):
    return _gn_bf16_fwd_impl(x, scale, bias, num_groups)[0]


def _gn_bf16_fwd(x, scale, bias, num_groups):
    y, (xhat, inv) = _gn_bf16_fwd_impl(x, scale, bias, num_groups)
    return y, (xhat, inv, scale)


def _gn_bf16_bwd(num_groups, res, dy):
    # Everything full-size stays bf16. The group statistics are derived from
    # per-(batch, channel) f32-accumulated spatial sums - reducing straight to
    # group means (jnp.mean(..., dtype=f32)) hands XLA a bf16 product with
    # multiple consumers and it materialises full-size f32 converts (profiled:
    # three ~26 GB/step f32 stagings + f32 layout copies in the sampler
    # backward). Via the (b, c) sums, the only f32 tensors are (b, c)-sized.
    xhat, inv, scale = res
    b, c = dy.shape[0], dy.shape[-1]
    cg = c // num_groups
    dy2 = dy.reshape(b, -1, c)
    p1 = _sum_spatial_f32(dy2)  # (b, c)
    p2 = _sum_spatial_f32(dy2 * xhat.reshape(b, -1, c))  # (b, c)
    dbias = p1.sum(0)
    dscale = p2.sum(0)
    n_spatial = xhat.size // (b * c)
    n_group = n_spatial * cg  # elements per normalization group
    sf = scale.astype(jnp.float32)
    # m1 = mean_g(dy*scale), m2 = mean_g(dy*scale*xhat): scale is constant
    # over spatial, so both collapse onto the (b, c) sums
    m1 = ((p1 * sf).reshape(b, num_groups, cg).sum(-1) / n_group)  # (b, g)
    m2 = ((p2 * sf).reshape(b, num_groups, cg).sum(-1) / n_group)
    bshape = (b,) + (1,) * (dy.ndim - 2) + (c,)
    m1c = jnp.repeat(m1, cg, axis=-1).astype(jnp.bfloat16).reshape(bshape)
    m2c = jnp.repeat(m2, cg, axis=-1).astype(jnp.bfloat16).reshape(bshape)
    invc = (
        jnp.repeat(inv.reshape(b, num_groups), cg, axis=-1)
        .astype(jnp.bfloat16)
        .reshape(bshape)
    )
    dx = (dy * scale.astype(jnp.bfloat16) - m1c - xhat * m2c) * invc
    return dx, dscale.astype(scale.dtype), dbias.astype(scale.dtype)


_gn_bf16.defvjp(_gn_bf16_fwd, _gn_bf16_bwd)


class LayerNorm(nn.Module):
    """torch-compatible last-dim LayerNorm (affine; Swin uses eps 1e-5).

    STATUS: opt-in, NOT used by the Swin backbone — three LayerNorm
    lowerings were A/B'd in situ on v5e (352x906 bs4 Swin-L, r4):
    flax nn.LayerNorm 38.5 ms fwd / 73.95 ms train iter; an MXU ones-GEMV
    custom_vjp 38.6 / 73.8 (neutral — the convert+reduce work just moves
    between fusion categories); the Pallas kernel in ops/layernorm.py
    41.3 / 77.9 (the kernel itself runs at traffic floor, 6.6 ms/iter for
    all ~50 norms, but the pallas_call boundary un-fuses the residual adds
    and window reshapes that XLA folds into flax-LN's fusions — net +25 ms
    of add_add/reshape/copy). flax's convert_reduce_fusion category is
    LN-shaped but carries co-fused elementwise work; removing LN from it
    does not remove that work. Kept (with the bf16 branch on the Pallas
    kernel) for shapes where the surrounding fusion structure differs.
    Param names/shapes ('scale'/'bias', f32, directly under this module)
    are identical to flax's, so checkpoint conversion
    (utils/convert_torch_checkpoint.py) is unaffected. Non-bf16
    configurations keep exact flax/torch f32-stat semantics (reference
    src/model/backbone/swin.py LayerNorm usage).
    """

    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        if self.dtype != jnp.bfloat16:
            xf = x.astype(jnp.float32)
            mean = xf.mean(-1, keepdims=True)
            var = ((xf - mean) ** 2).mean(-1, keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            y = y * scale + bias
            return y.astype(self.dtype or x.dtype)
        from ..ops.layernorm import layernorm_bf16

        return layernorm_bf16(x.astype(jnp.bfloat16), scale, bias,
                              self.epsilon)



def max_pool2d(
    x: jnp.ndarray,
    kernel: int,
    stride: int,
    padding: int = 0,
) -> jnp.ndarray:
    """torch MaxPool2d on NHWC (pads with -inf)."""
    return nn.max_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
    )


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int = 0) -> jnp.ndarray:
    return nn.avg_pool(
        x,
        window_shape=(kernel, kernel),
        strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        count_include_pad=True,
    )


def drop_path(x: jnp.ndarray, rate: float, deterministic: bool, rng) -> jnp.ndarray:
    """Stochastic depth (per-sample residual drop), timm-compatible."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x))
