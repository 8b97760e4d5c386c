"""Pallas fused window-attention kernel: interpret-mode parity vs the einsum
spec (SURVEY.md §4 layer 2: kernel parity tests). v2 calling convention:
q/k/v (B, nW, H, N, D), mask is the per-phase (nW, N, N) constant indexed by
window block inside the kernel (never tiled to (B*nW, N, N))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.ops.window_attention import (
    _pick_win_block,
    window_attention_pallas,
    window_attention_reference,
)


@pytest.mark.parametrize("b,nw,h,n,d,with_mask", [
    (2, 2, 3, 49, 32, False),
    (1, 6, 2, 49, 32, True),
    (2, 9, 6, 49, 32, True),   # nw not a multiple of win_block -> padding
])
def test_pallas_kernel_matches_reference(b, nw, h, n, d, with_mask):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, nw, h, n, d).astype(np.float32))
    k = jnp.asarray(rng.randn(b, nw, h, n, d).astype(np.float32))
    v = jnp.asarray(rng.randn(b, nw, h, n, d).astype(np.float32))
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32) * 0.1)
    mask = None
    if with_mask:
        # distinct mask per window so per-block indexing is actually exercised
        m = rng.choice([0.0, -100.0], size=(nw, n, n)).astype(np.float32)
        mask = jnp.asarray(m)
    scale = d ** -0.5

    ref = window_attention_reference(q, k, v, bias, mask, scale)
    out = window_attention_pallas(q, k, v, bias, mask, scale,
                                  win_block=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_pallas_kernel_bf16_inputs():
    rng = np.random.RandomState(1)
    b, nw, h, n, d = 1, 4, 2, 49, 32
    q = jnp.asarray(rng.randn(b, nw, h, n, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(b, nw, h, n, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(b, nw, h, n, d), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(h, n, n).astype(np.float32) * 0.1)
    ref = window_attention_reference(q, k, v, bias.astype(jnp.bfloat16), None, 0.17)
    out = window_attention_pallas(q, k, v, bias, None, 0.17,
                                  win_block=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_win_block_vmem_sizing():
    """Block auto-sizing keeps the whole per-block footprint (double-buffered
    I/O + f32 attention tile + scratch) within the budget across the Swin-L
    head counts (6/12/24/48); the budget is half the 16 MB scoped-vmem limit
    because Mosaic's accounting lands at ~2x the analytic estimate."""
    for h in (6, 12, 24, 48):
        bw = _pick_win_block(h, 56)
        assert 2 <= bw <= 64
        assert bw & (bw - 1) == 0
        # footprint at the chosen block stays under the 16 MB hardware limit
        # even with the observed 2x accounting factor
        io = 4 * bw * h * 56 * 32 * 2 * 2
        attn = bw * h * 56 * 56 * 4 * 2
        assert 2 * (io + attn) <= 16 * 1024 * 1024, (h, bw)
    assert _pick_win_block(6, 56) > _pick_win_block(48, 56)


@pytest.mark.parametrize("b,nw,heads,d,with_mask", [
    (2, 13, 6, 32, False),
    (2, 13, 6, 32, True),
    (1, 5, 4, 32, True),    # nw not a multiple of the window tile -> padding
    (2, 8, 2, 16, False),
])
def test_qkv_kernel_matches_reference(b, nw, heads, d, with_mask):
    """v3 fused-input kernel (qkv (B,nW,N,3C) straight from the Dense, the
    per-head split happens on VMEM-resident lane slices) == the einsum spec."""
    from diffusiondepth_tpu.ops.window_attention import (
        window_attention_qkv_pallas,
        window_attention_qkv_reference,
    )

    rng = np.random.RandomState(0)
    n, c = 49, heads * d
    qkv = jnp.asarray(rng.randn(b, nw, n, 3 * c), jnp.float32)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32) * 0.1)
    mask = None
    if with_mask:
        m = rng.choice([0.0, -100.0], size=(nw, n, n)).astype(np.float32)
        mask = jnp.asarray(m)
    scale = d ** -0.5

    ref = window_attention_qkv_reference(qkv, bias, mask, scale, heads)
    out = window_attention_qkv_pallas(qkv, bias, mask, scale, heads,
                                      win_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_qkv_kernel_bf16():
    from diffusiondepth_tpu.ops.window_attention import (
        window_attention_qkv_pallas,
        window_attention_qkv_reference,
    )

    rng = np.random.RandomState(1)
    b, nw, heads, d, n = 1, 6, 4, 32, 49
    c = heads * d
    qkv = jnp.asarray(rng.randn(b, nw, n, 3 * c), jnp.bfloat16)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32) * 0.1)
    ref = window_attention_qkv_reference(qkv, bias, None, 0.17, heads)
    out = window_attention_qkv_pallas(qkv, bias, None, 0.17, heads,
                                      win_tile=4, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("with_mask", [False, True])
def test_qkv_train_grads_match_reference(with_mask):
    """custom_vjp v3 kernel (flash-style recompute bwd): grads wrt qkv and
    the relpos bias match jax.grad of the einsum spec."""
    from diffusiondepth_tpu.ops.window_attention import (
        window_attention_qkv_reference,
        window_attention_qkv_train,
    )

    rng = np.random.RandomState(2)
    b, nw, heads, d, n = 2, 5, 4, 32, 49
    c = heads * d
    qkv = jnp.asarray(rng.randn(b, nw, n, 3 * c), jnp.float32)
    bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32) * 0.1)
    mask = None
    if with_mask:
        m = rng.choice([0.0, -100.0], size=(nw, n, n)).astype(np.float32)
        mask = jnp.asarray(m)
    scale = d ** -0.5
    cot = jnp.asarray(rng.randn(b, nw, n, c), jnp.float32)

    def loss_ref(qkv, bias):
        out = window_attention_qkv_reference(qkv, bias, mask, scale, heads)
        return jnp.sum(out * cot)

    def loss_ker(qkv, bias):
        out = window_attention_qkv_train(qkv, bias, mask, scale, heads,
                                         2, True)  # win_tile=2, interpret
        return jnp.sum(out * cot)

    gq_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    gq_ker, gb_ker = jax.grad(loss_ker, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_ker), np.asarray(gq_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb_ker), np.asarray(gb_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("train,with_mask", [
    (False, False), (False, True), (True, False), (True, True),
])
def test_windowmsa_fused_gate_dispatch(monkeypatch, train, with_mask):
    """VERDICT r4 #7: the WindowMSA fused-attention GATE + custom_vjp wiring,
    exercised on CPU via swin.FORCE_FUSED_INTERPRET. Asserts (a) the fused
    kernel entry point is actually invoked (a gate regression that silently
    fell back to the einsum path would fail the call-count check, not just
    sail through on matching numerics) and (b) outputs/param-grads match the
    einsum path."""
    from diffusiondepth_tpu.models.backbones import swin as swin_mod
    from diffusiondepth_tpu.ops import window_attention as wa

    heads, d, n = 4, 8, 49
    c = heads * d
    b, nw = 2, 5
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(b, nw, n, c), jnp.float32)
    mask = None
    if with_mask:
        mask = rng.choice([0.0, -100.0], size=(nw, n, n)).astype(np.float32)

    msa = swin_mod.WindowMSA(embed_dims=c, num_heads=heads,
                             window_size=(7, 7))
    params = msa.init(jax.random.PRNGKey(0), x, mask, False)

    calls = {"fused": 0}
    real_pallas = wa.window_attention_qkv_pallas
    real_train = wa.window_attention_qkv_train

    def counting_pallas(*a, **kw):
        calls["fused"] += 1
        return real_pallas(*a, **kw)

    def counting_train(*a, **kw):
        calls["fused"] += 1
        return real_train(*a, **kw)

    monkeypatch.setattr(wa, "window_attention_qkv_pallas", counting_pallas)
    monkeypatch.setattr(wa, "window_attention_qkv_train", counting_train)

    def loss(params, force):
        monkeypatch.setattr(swin_mod, "FORCE_FUSED_INTERPRET", force)
        out = msa.apply(params, x, mask, train)
        return jnp.sum(out * (1.0 + 0.01 * jnp.arange(c)))

    if train:  # the training twin is the differentiable custom_vjp kernel
        l_fused, g_fused = jax.value_and_grad(loss)(params, True)
    else:  # the eval kernel is forward-only by design
        l_fused, g_fused = loss(params, True), None
    assert calls["fused"] >= 1, "gate did not dispatch to the fused kernel"
    n_calls = calls["fused"]
    if train:
        l_ref, g_ref = jax.value_and_grad(loss)(params, False)
    else:
        l_ref, g_ref = loss(params, False), None
    assert calls["fused"] == n_calls, "einsum control run hit the kernel"

    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=1e-4)
    if train:
        flat_f = jax.tree_util.tree_leaves(g_fused)
        flat_r = jax.tree_util.tree_leaves(g_ref)
        for a, b_ in zip(flat_f, flat_r):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-3)
