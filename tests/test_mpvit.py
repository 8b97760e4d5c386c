"""MPViT backbone tests (reference: src/model/backbone/mpvit.py).

Shape contract from the reference's __main__ smoke block (:873-890):
mpvit_small on (B, 352, 906, 3) -> [1/2, 1/4, 1/8, 1/16] with channels
[128, 216, 288, 288]. Verified here on a smaller grid; plus a torch-math
parity check of the factorized-attention core.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.models.backbones.mpvit import (
    ConvRelPosEnc,
    FactorAttConvRelPosEnc,
    MPViT,
    mpvit_small,
)


@pytest.mark.slow
def test_mpvit_small_pyramid_shapes():
    model = mpvit_small()
    x = jnp.zeros((1, 64, 96, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    shapes = [o.shape for o in outs]
    assert shapes == [
        (1, 32, 48, 128),
        (1, 16, 24, 216),
        (1, 8, 12, 288),
        (1, 4, 6, 288),
    ]


def test_mpvit_odd_input_shapes():
    """Stride-2 dw convs with SAME-style padding handle odd grids the way
    torch conv2d(k3, s2, p1) does: out = floor((in - 1) / 2) + 1."""
    model = MPViT(
        num_path=(2, 2, 2, 2), num_layers=(1, 1, 1, 1),
        embed_dims=(16, 16, 16, 16), mlp_ratios=(2, 2, 2, 2),
    )
    x = jnp.zeros((1, 22, 45, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert [o.shape[1:3] for o in outs] == [(11, 23), (6, 12), (3, 6), (2, 3)]


def test_factorized_attention_matches_naive_math():
    """The einsum chain equals the reference formula
    scale * q @ (softmax_N(k)^T @ v) + q * crpe(v) (reference :371-384)."""
    rng = np.random.RandomState(0)
    b, h, w, heads, ch = 2, 4, 6, 2, 8
    c = heads * ch
    x = rng.randn(b, h, w, c).astype(np.float32)

    crpe = ConvRelPosEnc(head_ch=ch, num_heads=heads, window={3: 1, 5: 1})
    att = FactorAttConvRelPosEnc(dim=c, num_heads=heads)

    class Wrap:
        pass

    import flax.linen as nn

    class Both(nn.Module):
        @nn.compact
        def __call__(self, x):
            cr = ConvRelPosEnc(head_ch=ch, num_heads=heads,
                               window={3: 1, 5: 1}, name="crpe")
            return FactorAttConvRelPosEnc(dim=c, num_heads=heads,
                                          name="att")(x, cr)

    model = Both()
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = model.apply(variables, jnp.asarray(x))
    assert out.shape == (b, h, w, c)
    assert np.all(np.isfinite(np.asarray(out)))

    # naive recomputation from the same params
    p = variables["params"]["att"]
    qkv = x.reshape(b * h * w, c) @ np.asarray(p["qkv"]["kernel"]) + np.asarray(
        p["qkv"]["bias"]
    )
    qkv = qkv.reshape(b, h * w, 3, heads, ch)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    k_sm = np.exp(k - k.max(axis=1, keepdims=True))
    k_sm = k_sm / k_sm.sum(axis=1, keepdims=True)
    kv = np.einsum("bnhk,bnhv->bhkv", k_sm, v)
    factor = np.einsum("bnhk,bhkv->bnhv", q, kv) * (ch ** -0.5)

    # crpe part via the module itself (depthwise convs)
    crpe_mod = ConvRelPosEnc(head_ch=ch, num_heads=heads, window={3: 1, 5: 1})
    crpe_out = crpe_mod.apply(
        {"params": variables["params"]["crpe"]},
        jnp.asarray(q.reshape(b, h, w, heads, ch)),
        jnp.asarray(v.reshape(b, h, w, heads, ch)),
    )
    merged = factor.reshape(b, h, w, heads, ch) + np.asarray(crpe_out)
    expected = merged.reshape(b * h * w, c) @ np.asarray(
        p["proj"]["kernel"]
    ) + np.asarray(p["proj"]["bias"])
    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, c), expected, rtol=2e-4, atol=2e-4
    )
