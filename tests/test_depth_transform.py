"""Depth transform tests: shapes, decode parameterisation, analytic variants
(reference: src/model/ops/depth_transform.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffusiondepth_tpu.registry import DEPTH_TRANSFORMS
from diffusiondepth_tpu.models.depth_transform import (
    DeepDepthTransformWithUpsampling,
    DeepDepthTransformWithUpsamplingX4,
    ReciprocalDepthTransform,
    ReciprocalDepthTransformII,
    build_depth_transform,
)


def test_registry_has_all_six_transforms():
    for name in [
        "DeepDepthTransformWithUpsampling",
        "DeepDepthTransformWithUpsampling1x1",
        "DeepDepthTransformWithUpsamplingX4",
        "DeepDepthTransform",
        "ReciprocalDepthTransform",
        "ReciprocalDepthTransformII",
    ]:
        assert name in DEPTH_TRANSFORMS


def test_deep_transform_shapes_halving():
    m = DeepDepthTransformWithUpsampling()
    depth = jnp.ones((2, 228, 304, 1))
    vars_ = m.init(jax.random.PRNGKey(0), depth)
    latent = m.apply(vars_, depth, method=m.t)
    assert latent.shape == (2, 114, 152, 16)
    assert np.abs(np.asarray(latent)).max() <= 1.0  # tanh bounded
    decoded = m.apply(vars_, latent, method=m.inv_t)
    assert decoded.shape == (2, 228, 304, 1)
    assert (np.asarray(decoded) >= -1e-6).all()  # 1/sigmoid - 1 >= 0


def test_x4_transform_shapes():
    m = DeepDepthTransformWithUpsamplingX4()
    depth = jnp.ones((1, 64, 96, 1))
    vars_ = m.init(jax.random.PRNGKey(0), depth)
    latent = m.apply(vars_, depth, method=m.t)
    assert latent.shape == (1, 16, 24, 16)
    decoded = m.apply(vars_, latent, method=m.inv_t)
    assert decoded.shape == (1, 64, 96, 1)


def test_reciprocal_transform_roundtrip():
    m = ReciprocalDepthTransform()
    depth = jnp.asarray(np.random.RandomState(0).uniform(0.5, 80, (1, 8, 8, 1)).astype(np.float32))
    v = m.t(depth)
    assert (np.asarray(v) > 0).all() and (np.asarray(v) <= 1.0 + 1e-6).all()
    back = m.inv_t(v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(depth), rtol=1e-4)


def test_reciprocal_ii_roundtrip_above_min_depth():
    m = ReciprocalDepthTransformII(min_depth=0.5)
    depth = jnp.asarray(np.random.RandomState(1).uniform(1.0, 50, (1, 4, 4, 1)).astype(np.float32))
    back = m.inv_t(m.t(depth))
    np.testing.assert_allclose(np.asarray(back), np.asarray(depth), rtol=1e-5)


def test_build_from_cfg_dict():
    m = build_depth_transform(dict(type="DeepDepthTransformWithUpsampling", hidden=16, eps=1e-6))
    assert isinstance(m, DeepDepthTransformWithUpsampling)
