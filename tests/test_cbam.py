"""CBAM attention block + the CBAM ResNet variant (reference:
src/model/ops/cbam.py:45-96, mmbev_resnet.py BasicBlockWithCBAM :16-98)."""

import jax
import jax.numpy as jnp
import numpy as np

from diffusiondepth_tpu.models.backbones.mmbev_resnet import ResNetForMMBEV
from diffusiondepth_tpu.ops.cbam import CBAMWithPosEmbed


def test_cbam_shapes_and_gating():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 12, 32).astype(np.float32))
    mod = CBAMWithPosEmbed(pos_embed_planes=16)
    v = mod.init(jax.random.PRNGKey(0), x, False)
    out = mod.apply(v, x, False)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_cbam_resnet_variant_pyramid():
    model = ResNetForMMBEV(
        num_layer=(1, 1), num_channels=(16, 32), stride=(2, 2),
        block_type="BasicBlockWithCBAM",
    )
    x = jnp.zeros((1, 32, 48, 3))
    v = model.init(jax.random.PRNGKey(0), x, train=False)
    feats = model.apply(v, x, train=False)
    assert [f.shape for f in feats] == [(1, 16, 24, 16), (1, 8, 12, 32)]
