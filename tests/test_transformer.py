"""Deformable-DETR encoder / pixel decoder tests (reference:
src/model/utils/transformer.py — capability-surface components)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.models.necks.transformer import (
    PixelTransformerDecoder,
    PureMSDEnTransformer,
    inverse_sigmoid,
)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.1, 0.5, 0.9])
    y = jax.nn.sigmoid(inverse_sigmoid(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5)


def test_pure_msde_transformer_shapes():
    rng = np.random.RandomState(0)
    feats = [
        jnp.asarray(rng.randn(2, 8, 12, 64).astype(np.float32)),
        jnp.asarray(rng.randn(2, 4, 6, 64).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 3, 64).astype(np.float32)),
    ]
    model = PureMSDEnTransformer(num_layers=2, embed_dims=64, num_heads=4,
                                 pe_num_feats=32)
    v = model.init(jax.random.PRNGKey(0), feats, train=False)
    outs = model.apply(v, feats, train=False)
    assert [o.shape for o in outs] == [f.shape for f in feats]
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_pixel_transformer_decoder_bins_and_maps():
    rng = np.random.RandomState(1)
    ms_feats = [
        jnp.asarray(rng.randn(2, 4, 6, 32).astype(np.float32)),
        jnp.asarray(rng.randn(2, 2, 3, 32).astype(np.float32)),
    ]
    mask_features = jnp.asarray(rng.randn(2, 16, 24, 32).astype(np.float32))
    model = PixelTransformerDecoder(
        hidden_dim=32, num_layers=3, num_feature_levels=2, num_queries=16,
        num_heads=4, classify=True, class_num=10, pe_num_feats=16,
    )
    v = model.init(jax.random.PRNGKey(0), ms_feats, mask_features, train=False)
    bins, maps, cls = model.apply(v, ms_feats, mask_features, train=False)
    assert bins.shape == (2, 16)
    assert maps.shape == (2, 16, 24, 16)
    assert cls.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(bins)))
