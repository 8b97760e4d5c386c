"""Checkpoint-converter layout tests: every transform rule is verified
numerically against torch-cpu (reference conversion logic:
src/model/backbone/convert_ckpt.py, swin.py:685-754)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F
from flax import linen as nn

from diffusiondepth_tpu.models.backbones.swin import PatchMerging
from diffusiondepth_tpu.models.common import BatchNorm
from diffusiondepth_tpu.utils.convert_torch_checkpoint import (
    bn_params,
    conv_kernel,
    conv_transpose_kernel,
    convert_swin_official,
    correct_unfold_norm_order,
    correct_unfold_reduction_order,
    dense_kernel,
    merge_params,
    resize_rel_pos_table,
)

RNG = np.random.RandomState(0)


def t2n(x):
    return x.detach().numpy()


def test_conv_kernel_layout():
    x = RNG.randn(2, 5, 7, 3).astype(np.float32)  # NHWC
    w = RNG.randn(4, 3, 3, 3).astype(np.float32)  # OIHW
    b = RNG.randn(4).astype(np.float32)
    ref = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                   torch.from_numpy(w), torch.from_numpy(b), padding=1)
    mod = nn.Conv(4, (3, 3), padding=((1, 1), (1, 1)))
    variables = {"params": {"kernel": jnp.asarray(conv_kernel(w)),
                            "bias": jnp.asarray(b)}}
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out), t2n(ref).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (2, 2, 0, 0), (4, 2, 1, 0)])
def test_conv_transpose_kernel_layout(k, s, p, op):
    """torch ConvTranspose2d == our TorchConvTranspose with the converted
    kernel, for every deconv config the reference uses (NLSPN decoder k3s2,
    FPN up k2s2, depth-transform decoder k4s2)."""
    from diffusiondepth_tpu.models.common import TorchConvTranspose

    x = RNG.randn(1, 6, 8, 3).astype(np.float32)
    w = RNG.randn(3, 4, k, k).astype(np.float32)  # torch convT: (I, O, kh, kw)
    b = RNG.randn(4).astype(np.float32)
    ref = F.conv_transpose2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(w),
        torch.from_numpy(b), stride=s, padding=p, output_padding=op,
    )
    mod = TorchConvTranspose(4, (k, k), (s, s), padding=p, output_padding=op)
    variables = {"params": {"kernel": jnp.asarray(conv_transpose_kernel(w).copy()),
                            "bias": jnp.asarray(b)}}
    out = mod.apply(variables, jnp.asarray(x))
    assert out.shape == (1, 12, 16, 4)
    np.testing.assert_allclose(
        np.asarray(out), t2n(ref).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_dense_kernel_layout():
    x = RNG.randn(5, 6).astype(np.float32)
    w = RNG.randn(8, 6).astype(np.float32)
    b = RNG.randn(8).astype(np.float32)
    ref = F.linear(torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b))
    out = x @ dense_kernel(w) + b
    np.testing.assert_allclose(out, t2n(ref), rtol=1e-5, atol=1e-6)


def test_batchnorm_conversion():
    tbn = torch.nn.BatchNorm2d(5)
    tbn.weight.data = torch.from_numpy(RNG.rand(5).astype(np.float32) + 0.5)
    tbn.bias.data = torch.from_numpy(RNG.randn(5).astype(np.float32))
    tbn.running_mean = torch.from_numpy(RNG.randn(5).astype(np.float32))
    tbn.running_var = torch.from_numpy(RNG.rand(5).astype(np.float32) + 0.5)
    tbn.eval()
    x = RNG.randn(2, 4, 4, 5).astype(np.float32)
    ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    sd = {f"bn.{k}": t2n(v) for k, v in tbn.state_dict().items()}
    p, stats = bn_params(sd, "bn")
    mod = BatchNorm()
    variables = {
        "params": {"BatchNorm_0": {"scale": p["scale"], "bias": p["bias"]}},
        "batch_stats": {"BatchNorm_0": {"mean": stats["mean"], "var": stats["var"]}},
    }
    out = mod.apply(variables, jnp.asarray(x), False)
    np.testing.assert_allclose(
        np.asarray(out), t2n(ref).transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_patch_merging_official_order_conversion():
    """Official Swin PatchMerging (x0;x1;x2;x3 concat, torch) == our unfold
    PatchMerging with reorder-converted weights."""
    b, h, w, c = 1, 4, 6, 8
    x = RNG.randn(b, h, w, c).astype(np.float32)
    w_red = RNG.randn(2 * c, 4 * c).astype(np.float32)
    w_norm = RNG.rand(4 * c).astype(np.float32) + 0.5
    b_norm = RNG.randn(4 * c).astype(np.float32)

    # official forward (torch, NHWC input like the official repo)
    xt = torch.from_numpy(x)
    x0 = xt[:, 0::2, 0::2, :]
    x1 = xt[:, 1::2, 0::2, :]
    x2 = xt[:, 0::2, 1::2, :]
    x3 = xt[:, 1::2, 1::2, :]
    cat = torch.cat([x0, x1, x2, x3], -1)
    normed = F.layer_norm(cat, (4 * c,), torch.from_numpy(w_norm),
                          torch.from_numpy(b_norm))
    ref = F.linear(normed, torch.from_numpy(w_red))

    mod = PatchMerging(out_channels=2 * c)
    variables = {
        "params": {
            "norm": {
                "scale": jnp.asarray(correct_unfold_norm_order(w_norm)),
                "bias": jnp.asarray(correct_unfold_norm_order(b_norm)),
            },
            "reduction": {
                "kernel": jnp.asarray(
                    dense_kernel(correct_unfold_reduction_order(w_red))
                )
            },
        }
    }
    out = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), t2n(ref), rtol=1e-4, atol=1e-5)


def test_rel_pos_table_resize_identity_and_shape():
    table = RNG.randn(169, 6).astype(np.float32)  # window 7 -> 13x13
    same = resize_rel_pos_table(table, 169)
    np.testing.assert_array_equal(same, table)
    up = resize_rel_pos_table(table, 529)  # window 12 -> 23x23
    assert up.shape == (529, 6)
    assert np.all(np.isfinite(up))


def test_convert_swin_official_end_to_end_forward():
    """Random official-style state dict -> converted params run through our
    Swin-T and produce finite pyramids (merge over init for missing norms)."""
    from diffusiondepth_tpu.models.backbones.swin import SwinTransformer

    depths, heads = (2, 2), (3, 6)
    dim, win = 24, 7
    sd = {}
    sd["patch_embed.proj.weight"] = RNG.randn(dim, 3, 4, 4).astype(np.float32) * 0.1
    sd["patch_embed.proj.bias"] = np.zeros(dim, np.float32)
    sd["patch_embed.norm.weight"] = np.ones(dim, np.float32)
    sd["patch_embed.norm.bias"] = np.zeros(dim, np.float32)
    d = dim
    for i, dep in enumerate(depths):
        for j in range(dep):
            p = f"layers.{i}.blocks.{j}"
            for n in ("norm1", "norm2"):
                sd[f"{p}.{n}.weight"] = np.ones(d, np.float32)
                sd[f"{p}.{n}.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.qkv.weight"] = RNG.randn(3 * d, d).astype(np.float32) * 0.05
            sd[f"{p}.attn.qkv.bias"] = np.zeros(3 * d, np.float32)
            sd[f"{p}.attn.proj.weight"] = RNG.randn(d, d).astype(np.float32) * 0.05
            sd[f"{p}.attn.proj.bias"] = np.zeros(d, np.float32)
            sd[f"{p}.attn.relative_position_bias_table"] = (
                RNG.randn((2 * win - 1) ** 2, heads[i]).astype(np.float32) * 0.02
            )
            sd[f"{p}.mlp.fc1.weight"] = RNG.randn(4 * d, d).astype(np.float32) * 0.05
            sd[f"{p}.mlp.fc1.bias"] = np.zeros(4 * d, np.float32)
            sd[f"{p}.mlp.fc2.weight"] = RNG.randn(d, 4 * d).astype(np.float32) * 0.05
            sd[f"{p}.mlp.fc2.bias"] = np.zeros(d, np.float32)
        if i < len(depths) - 1:
            sd[f"layers.{i}.downsample.reduction.weight"] = (
                RNG.randn(2 * d, 4 * d).astype(np.float32) * 0.05
            )
            sd[f"layers.{i}.downsample.norm.weight"] = np.ones(4 * d, np.float32)
            sd[f"layers.{i}.downsample.norm.bias"] = np.zeros(4 * d, np.float32)
            d *= 2

    converted = convert_swin_official(sd, depths=depths, window_size=win)
    model = SwinTransformer(embed_dims=dim, depths=depths, num_heads=heads,
                            out_indices=(0, 1))
    x = jnp.asarray(RNG.randn(1, 28, 28, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    merged = merge_params(dict(variables["params"]), converted)
    outs = model.apply({"params": merged}, x, train=False)
    assert [o.shape for o in outs] == [(1, 7, 7, dim), (1, 4, 4, 2 * dim)]
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))
