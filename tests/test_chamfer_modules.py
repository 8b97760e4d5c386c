"""BinsChamferLoss vs brute force; deform-conv module wrappers (Pack variants
start as dense convs, reference deformconv/modules + test.py:142)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from diffusiondepth_tpu.losses.chamfer import bins_chamfer_loss
from diffusiondepth_tpu.ops.deform_conv_modules import (
    DeformConvPack,
    DeformRoIPoolingPack,
    ModulatedDeformConvPack,
)


def test_chamfer_matches_bruteforce():
    rng = np.random.RandomState(0)
    bins = np.sort(rng.rand(2, 9).astype(np.float32) * 10, axis=1)
    depth = rng.rand(2, 6, 8, 1).astype(np.float32) * 10
    depth[0, :3] = 0.0  # invalid region

    got = float(bins_chamfer_loss(jnp.asarray(bins), jnp.asarray(depth)))

    centers = 0.5 * (bins[:, 1:] + bins[:, :-1])
    total = 0.0
    for b in range(2):
        tgt = depth[b].reshape(-1)
        tgt = tgt[tgt >= 1e-3]
        d2 = (centers[b][:, None] - tgt[None, :]) ** 2
        total += d2.min(1).mean() + d2.min(0).mean()
    np.testing.assert_allclose(got, total / 2, rtol=1e-5)


def test_chamfer_all_invalid_is_finite():
    bins = jnp.asarray(np.linspace(0, 10, 11, dtype=np.float32)[None])
    depth = jnp.zeros((1, 4, 4, 1))
    assert np.isfinite(float(bins_chamfer_loss(bins, depth)))


def test_modulated_pack_zero_init_is_half_dense_conv():
    """Zero-init offsets + sigmoid(0)=0.5 mask -> 0.5 * dense conv."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    mod = ModulatedDeformConvPack(features=4, kernel_size=3, padding=1,
                                  use_bias=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    kernel = v["params"]["kernel"]
    dense = lax.conv_general_dilated(
        x, kernel, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), 0.5 * np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_deform_pack_zero_init_is_dense_conv():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    mod = DeformConvPack(features=4, kernel_size=3, padding=1)
    v = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(v, x)
    dense = lax.conv_general_dilated(
        x, v["params"]["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                               rtol=1e-4, atol=1e-5)


def test_roi_pooling_pack_runs():
    x = jnp.ones((1, 16, 16, 3 * 3 * 2))
    rois = jnp.asarray([[0, 2.0, 2.0, 12.0, 12.0]])
    mod = DeformRoIPoolingPack(out_size=3, hidden=16)
    v = mod.init(jax.random.PRNGKey(0), x, rois)
    out = mod.apply(v, x, rois)
    assert out.shape == (1, 3, 3, 2)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
