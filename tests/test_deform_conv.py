"""Deformable-conv op tests, mirroring the reference gradcheck harness
(src/model/deformconv/test.py): zero-offset equals dense conv
(check_dconv_zero_offset :36, check_mdconv_zero_offset_identify :142),
integer offsets equal shifted inputs, modulation scales linearly, and
gradients check out in fp64-free form via jax.test_util.check_grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from diffusiondepth_tpu.ops.deform_conv import (
    deform_conv,
    deform_im2col,
    deform_psroi_pooling,
    modulated_deform_conv,
)


def dense_conv_nhwc(x, w, stride=1, padding=0, dilation=1, groups=1):
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


@pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 1, 1), (1, 2, 2)])
def test_zero_offset_equals_dense_conv(stride, padding, dilation):
    rng = np.random.RandomState(0)
    b, h, w, cin, cout, k = 2, 9, 11, 4, 6, 3
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32) * 0.1
    ho = (h + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    wo = (w + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    offset = jnp.zeros((b, ho, wo, k * k * 2))
    mask = jnp.ones((b, ho, wo, k * k))

    out = modulated_deform_conv(x, offset, mask, wgt, stride=stride,
                                padding=padding, dilation=dilation)
    ref = dense_conv_nhwc(x, wgt, stride, padding, dilation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_v1_zero_offset_equals_dense_conv_groups():
    rng = np.random.RandomState(1)
    b, h, w, cin, cout, k, g = 1, 8, 8, 4, 8, 3, 2
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, cin // g, cout), jnp.float32) * 0.1
    offset = jnp.zeros((b, 8, 8, k * k * 2))
    out = deform_conv(x, offset, wgt, padding=1, groups=g)
    ref = dense_conv_nhwc(x, wgt, 1, 1, 1, groups=g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    """Constant integer offset (dy=0, dx=1) on a 1x1 kernel == shift left."""
    rng = np.random.RandomState(2)
    b, h, w = 1, 6, 7
    x = jnp.asarray(rng.randn(b, h, w, 1), jnp.float32)
    wgt = jnp.ones((1, 1, 1, 1), jnp.float32)
    offset = jnp.tile(jnp.asarray([0.0, 1.0]), (b, h, w, 1))
    mask = jnp.ones((b, h, w, 1))
    out = np.asarray(modulated_deform_conv(x, offset, mask, wgt))
    expected = np.zeros_like(np.asarray(x))
    expected[:, :, :-1] = np.asarray(x)[:, :, 1:]
    np.testing.assert_allclose(out, expected, rtol=1e-5, atol=1e-6)


def test_mask_scales_output_linearly():
    rng = np.random.RandomState(3)
    b, h, w, cin, cout, k = 1, 5, 5, 2, 3, 3
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float32)
    offset = jnp.asarray(rng.randn(b, 5, 5, k * k * 2), jnp.float32) * 0.3
    mask = jnp.asarray(rng.rand(b, 5, 5, k * k), jnp.float32)
    out1 = modulated_deform_conv(x, offset, mask, wgt, padding=1)
    out2 = modulated_deform_conv(x, offset, 2.0 * mask, wgt, padding=1)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out1),
                               rtol=1e-4, atol=1e-5)


def test_gradients_exist_and_check():
    """check_grads over input, offset (coordinate grads!), mask, and weight -
    the JAX equivalent of the reference's fp64 torch.autograd.gradcheck
    (deformconv/test.py:375-435)."""
    from jax.test_util import check_grads

    rng = np.random.RandomState(4)
    b, h, w, cin, cout, k = 1, 5, 6, 2, 2, 3
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float64)
    wgt = jnp.asarray(rng.randn(k, k, cin, cout), jnp.float64) * 0.3
    # keep offsets away from integer lattice points where bilinear
    # interpolation is non-differentiable (same trick as the CUDA gradcheck)
    offset = jnp.asarray(rng.rand(b, h, w, k * k * 2) * 0.6 + 0.13, jnp.float64)
    mask = jnp.asarray(rng.rand(b, h, w, k * k) * 0.9 + 0.05, jnp.float64)

    def f(x_, o_, m_, w_):
        return jnp.sum(
            modulated_deform_conv(x_, o_, m_, w_, padding=1) ** 2
        )

    check_grads(f, (x, offset, mask, wgt), order=1, modes=["rev"],
                rtol=1e-4, atol=1e-4)


def test_deformable_groups_use_distinct_offsets():
    rng = np.random.RandomState(5)
    b, h, w, cin, k, dg = 1, 4, 4, 4, 1, 2
    x = jnp.asarray(rng.randn(b, h, w, cin), jnp.float32)
    # group 0: zero offset; group 1: dx = +1
    off0 = np.zeros((b, h, w, 2), np.float32)
    off1 = np.tile(np.asarray([0.0, 1.0], np.float32), (b, h, w, 1))
    offset = jnp.asarray(np.concatenate([off0, off1], -1))
    mask = jnp.ones((b, h, w, dg))
    col = deform_im2col(x, offset, mask, (1, 1), deformable_groups=dg)
    col = np.asarray(col)[:, :, :, 0]  # (B, H, W, C)
    xn = np.asarray(x)
    np.testing.assert_allclose(col[..., :2], xn[..., :2], atol=1e-6)
    np.testing.assert_allclose(col[:, :, :-1, 2:], xn[:, :, 1:, 2:], atol=1e-6)
    assert np.all(col[:, :, -1, 2:] == 0)  # shifted out -> zero pad


def test_psroi_pooling_uniform_map():
    """On a constant position-sensitive map, pooling returns the constant."""
    p, c_out = 3, 2
    x = jnp.ones((1, 16, 16, p * p * c_out)) * 5.0
    rois = jnp.asarray([[0, 2.0, 2.0, 10.0, 10.0]])
    out = deform_psroi_pooling(x, rois, None, out_size=p)
    assert out.shape == (1, p, p, c_out)
    np.testing.assert_allclose(np.asarray(out), 5.0, rtol=1e-5)
