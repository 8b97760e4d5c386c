"""Pallas fused window-attention kernel: interpret-mode parity vs the einsum
spec (SURVEY.md §4 layer 2: kernel parity tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.ops.window_attention import (
    window_attention_pallas,
    window_attention_reference,
)


@pytest.mark.parametrize("g,h,n,d,with_mask", [
    (4, 3, 49, 32, False),
    (6, 2, 49, 32, True),
    (16, 6, 49, 32, True),
])
def test_pallas_kernel_matches_reference(g, h, n, d, with_mask):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(g, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(g, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(g, h, n, d).astype(np.float32))
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32) * 0.1)
    mask = None
    if with_mask:
        m = np.zeros((g, n, n), np.float32)
        m[:, : n // 2, n // 2 :] = -100.0
        m[:, n // 2 :, : n // 2] = -100.0
        mask = jnp.asarray(m)
    scale = d ** -0.5

    ref = window_attention_reference(q, k, v, bias, mask, scale)
    out = window_attention_pallas(q, k, v, bias, mask, scale,
                                  win_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_kernel_bf16_inputs():
    rng = np.random.RandomState(1)
    g, h, n, d = 4, 2, 49, 32
    q = jnp.asarray(rng.randn(g, h, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(g, h, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(g, h, n, d), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32) * 0.1)
    ref = window_attention_reference(q, k, v, bias.astype(jnp.bfloat16), None, 0.17)
    out = window_attention_pallas(q, k, v, bias, None, 0.17,
                                  win_block=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )
