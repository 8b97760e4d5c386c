"""Swin backbone tests: pyramid shapes vs reference docstring
(src/model/backbone/swin.py:33-39 head docstring and :214-222), relative
position index vs mmcv's double_step_seq construction, window partition
roundtrip, shifted mask semantics, and WindowMSA math vs a torch
re-implementation with shared weights."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import pytest

from diffusiondepth_tpu.models.backbones.swin import (
    PatchMerging,
    SwinTransformer,
    WindowMSA,
    relative_position_index,
    shifted_window_mask,
    window_partition,
    window_reverse,
)


def test_relative_position_index_matches_mmcv_double_step_seq():
    wh = ww = 7

    def double_step_seq(step1, len1, step2, len2):
        seq1 = torch.arange(0, step1 * len1, step1)
        seq2 = torch.arange(0, step2 * len2, step2)
        return (seq1[:, None] + seq2[None, :]).reshape(1, -1)

    rel_index_coords = double_step_seq(2 * ww - 1, wh, 1, ww)
    rel_position_index = rel_index_coords + rel_index_coords.T
    rel_position_index = rel_position_index.flip(1)
    ours = relative_position_index(wh, ww)
    np.testing.assert_array_equal(ours, rel_position_index.numpy())


def test_window_partition_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 14, 21, 5).astype(np.float32))
    wins = window_partition(x, 7)
    assert wins.shape == (2, 2 * 3, 49, 5)
    back = window_reverse(wins, 7, 14, 21)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shifted_window_mask_matches_reference_construction():
    h_pad = w_pad = 14
    window, shift = 7, 3
    ours = shifted_window_mask(h_pad, w_pad, window, shift)

    # reference construction (swin.py:269-291) in torch
    img_mask = torch.zeros((1, h_pad, w_pad, 1))
    h_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    w_slices = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    cnt = 0
    for h in h_slices:
        for w in w_slices:
            img_mask[:, h, w, :] = cnt
            cnt += 1
    B, H, W, C = img_mask.shape
    x = img_mask.view(B, H // window, window, W // window, window, C)
    mw = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window * window)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, -100.0).masked_fill(
        attn_mask == 0, 0.0
    )
    np.testing.assert_array_equal(ours, attn_mask.numpy())


def test_window_msa_matches_torch_math():
    """Same weights -> same outputs as a plain torch WindowMSA."""
    embed, heads, ws, n = 32, 4, 4, 16
    msa = WindowMSA(embed_dims=embed, num_heads=heads, window_size=(ws, ws))
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, n, embed).astype(np.float32)
    variables = msa.init(jax.random.PRNGKey(0), jnp.asarray(x), None, False)
    out = msa.apply(variables, jnp.asarray(x), None, False)

    p = variables["params"]
    qkv_w = torch.from_numpy(np.asarray(p["qkv"]["kernel"]))  # (C, 3C)
    qkv_b = torch.from_numpy(np.asarray(p["qkv"]["bias"]))
    proj_w = torch.from_numpy(np.asarray(p["proj"]["kernel"]))
    proj_b = torch.from_numpy(np.asarray(p["proj"]["bias"]))
    table = torch.from_numpy(np.asarray(p["relative_position_bias_table"]))

    xt = torch.from_numpy(x.reshape(-1, n, embed))  # (B*nW, N, C)
    B, N, C = xt.shape
    qkv = (xt @ qkv_w + qkv_b).reshape(B, N, 3, heads, C // heads)
    qkv = qkv.permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (C // heads) ** -0.5
    attn = q @ k.transpose(-2, -1)
    idx = torch.from_numpy(relative_position_index(ws, ws).reshape(-1))
    bias = table[idx].reshape(N, N, heads).permute(2, 0, 1)
    attn = attn + bias.unsqueeze(0)
    attn = torch.softmax(attn, dim=-1)
    ref = (attn @ v).transpose(1, 2).reshape(B, N, C) @ proj_w + proj_b

    np.testing.assert_allclose(
        np.asarray(out).reshape(-1, n, embed), ref.numpy(), rtol=2e-4, atol=2e-5
    )


def test_patch_merging_matches_torch_unfold_ordering():
    c, h, w = 6, 8, 10
    pm = PatchMerging(out_channels=2 * c)
    rng = np.random.RandomState(1)
    x = rng.randn(1, h, w, c).astype(np.float32)
    variables = pm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = pm.apply(variables, jnp.asarray(x))
    assert out.shape == (1, h // 2, w // 2, 2 * c)

    # torch: unfold(k=2,s=2) -> LN -> Linear, using the same weights
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
    unfolded = torch.nn.functional.unfold(xt, 2, stride=2).transpose(1, 2)  # B,L,4C
    p = variables["params"]
    g = torch.from_numpy(np.asarray(p["norm"]["scale"]))
    b = torch.from_numpy(np.asarray(p["norm"]["bias"]))
    wt = torch.from_numpy(np.asarray(p["reduction"]["kernel"]))
    normed = torch.nn.functional.layer_norm(unfolded, (4 * c,), g, b)
    ref = (normed @ wt).reshape(1, h // 2, w // 2, 2 * c)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_swin_tiny_pyramid_shapes_228x304():
    """Reference Swin-L doc shapes for 228x304 / 57x76 grid (swin.py:33-39);
    shapes depend only on geometry so swin_tiny checks them fast."""
    model = SwinTransformer(embed_dims=96, depths=(2, 2, 2, 2),
                            num_heads=(3, 6, 12, 24))
    x = jnp.zeros((1, 228, 304, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(variables, x)
    shapes = [tuple(o.shape) for o in outs]
    assert shapes == [
        (1, 57, 76, 96),
        (1, 29, 38, 192),
        (1, 15, 19, 384),
        (1, 8, 10, 768),
    ]


def test_swin_train_mode_with_droppath():
    model = SwinTransformer(embed_dims=32, depths=(2, 2), num_heads=(2, 4),
                            drop_path_rate=0.2)
    x = jnp.zeros((2, 56, 56, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    outs = model.apply(
        variables, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
    )
    assert len(outs) == 2
