"""Parity tests of resize/pool ops against torch (cpu) - the ops must be
bit-compatible with the F.interpolate / adaptive_pool calls the reference
uses (src/model/ops/resize.py, FPN pooling, UpSample_add)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from diffusiondepth_tpu.ops import (
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    resize_bilinear,
    resize_nearest,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _nhwc(t_nchw):
    return np.transpose(t_nchw.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((8, 10), (16, 20)), ((15, 19), (29, 38)), ((29, 38), (15, 19)), ((7, 7), (13, 11))],
)
def test_bilinear_matches_torch(align_corners, in_hw, out_hw):
    rng = np.random.RandomState(0)
    x = rng.randn(2, *in_hw, 3).astype(np.float32)
    ours = resize_bilinear(jnp.asarray(x), out_hw, align_corners=align_corners)
    theirs = F.interpolate(_nchw(x), size=out_hw, mode="bilinear", align_corners=align_corners)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((30, 40), (29, 38)), ((16, 20), (15, 19)), ((57, 76), (29, 38)), ((9, 9), (9, 9))],
)
def test_adaptive_avg_pool_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(1)
    x = rng.randn(2, *in_hw, 4).astype(np.float32)
    ours = adaptive_avg_pool2d(jnp.asarray(x), out_hw)
    theirs = F.adaptive_avg_pool2d(_nchw(x), out_hw)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_hw,out_hw", [((30, 40), (13, 17)), ((8, 8), (3, 5))])
def test_adaptive_max_pool_matches_torch(in_hw, out_hw):
    rng = np.random.RandomState(2)
    x = rng.randn(1, *in_hw, 2).astype(np.float32)
    ours = adaptive_max_pool2d(jnp.asarray(x), out_hw)
    theirs = F.adaptive_max_pool2d(_nchw(x), out_hw)
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=1e-6, atol=1e-6)


def test_nearest_matches_torch():
    rng = np.random.RandomState(3)
    x = rng.randn(1, 10, 14, 2).astype(np.float32)
    ours = resize_nearest(jnp.asarray(x), (23, 9))
    theirs = F.interpolate(_nchw(x), size=(23, 9), mode="nearest")
    np.testing.assert_allclose(np.asarray(ours), _nhwc(theirs), rtol=0, atol=0)


def test_adaptive_pad_matches_torch_same_semantics():
    """'same' mode == torch/mmcv AdaptivePadding: output size = ceil(in/stride)."""
    import jax.numpy as jnp

    from diffusiondepth_tpu.ops.padding import PatchEmbed, adaptive_pad

    x = jnp.ones((1, 13, 17, 3))
    for mode in ("corner", "same"):
        y = adaptive_pad(x, kernel_size=4, stride=4, mode=mode)
        assert y.shape == (1, 16, 20, 3)
        if mode == "corner":  # content sits top-left
            np.testing.assert_array_equal(np.asarray(y[:, :13, :17]), 1.0)
            np.testing.assert_array_equal(np.asarray(y[:, 13:, :]), 0.0)

    import jax

    pe = PatchEmbed(embed_dims=8, kernel_size=4)
    v = pe.init(jax.random.PRNGKey(0), x)
    out = pe.apply(v, x)
    assert out.shape == (1, 4, 5, 8)
