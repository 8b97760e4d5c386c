"""Torch-checkpoint conversion to flax params.

The reference loads two kinds of torch weights:
  1. official ImageNet-pretrained Swin backbones, remapped by
     ``swin_convert`` + bicubic rel-pos-table resize
     (src/model/backbone/convert_ckpt.py:4-57, swin.py:685-754)
  2. its own trained full-model checkpoints (``model_EEEEE.pt``)

This module re-implements both key mappings against the flax module tree,
plus the layout transforms (torch OIHW conv -> flax HWIO, Linear transpose,
BatchNorm weight/bias/running stats split). Layout rules are unit-tested
numerically against torch-cpu in tests/test_convert_torch.py.

All functions take/return plain numpy; no torch import is needed unless the
caller starts from a ``.pt`` file (``load_torch_file``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

# ------------------------------------------------------------------ layout


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (O, I/g, kh, kw) -> flax (kh, kw, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O/g, kh, kw) -> our
    ``TorchConvTranspose`` kernel (kh, kw, I, O/g). The spatial flip torch
    semantics require happens inside the module, so conversion is a pure
    transpose."""
    return np.transpose(w, (2, 3, 0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (O, I) -> flax Dense kernel (I, O)."""
    return np.transpose(w)


def bn_params(sd: Dict[str, np.ndarray], prefix: str) -> Tuple[Dict, Dict]:
    """-> ({scale, bias}, {mean, var}) for a torch BatchNorm prefix."""
    params = {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}
    stats = {
        "mean": sd[prefix + ".running_mean"],
        "var": sd[prefix + ".running_var"],
    }
    return params, stats


def ln_params(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    return {"scale": sd[prefix + ".weight"], "bias": sd[prefix + ".bias"]}


# ------------------------------------------------- swin official remapping


def correct_unfold_reduction_order(x: np.ndarray) -> np.ndarray:
    """Official PatchMerging concat order [x0;x1;x2;x3] -> unfold (c, i, j)
    order (reference convert_ckpt.py:7-12)."""
    out_channel, in_channel = x.shape
    x = x.reshape(out_channel, 4, in_channel // 4)
    x = x[:, [0, 2, 1, 3], :].transpose(0, 2, 1).reshape(out_channel, in_channel)
    return x


def correct_unfold_norm_order(x: np.ndarray) -> np.ndarray:
    """(reference convert_ckpt.py:14-18)."""
    in_channel = x.shape[0]
    x = x.reshape(4, in_channel // 4)
    return x[[0, 2, 1, 3], :].transpose(1, 0).reshape(in_channel)


def resize_rel_pos_table(table: np.ndarray, target_len: int) -> np.ndarray:
    """Bicubic resize of a ((2w-1)^2, nH) table to a new window size
    (reference swin.py:728-748)."""
    L1, nH = table.shape
    if L1 == target_len:
        return table
    S1 = int(round(L1 ** 0.5))
    S2 = int(round(target_len ** 0.5))
    import jax

    img = table.transpose(1, 0).reshape(nH, S1, S1)
    resized = jax.image.resize(
        np.asarray(img, np.float32), (nH, S2, S2), method="bicubic"
    )
    return np.asarray(resized).reshape(nH, target_len).transpose(1, 0)


def convert_swin_official(
    sd: Dict[str, np.ndarray],
    depths: Tuple[int, ...] = (2, 2, 18, 2),
    window_size: int = 7,
) -> Dict[str, Any]:
    """Official Microsoft Swin classification checkpoint -> flax params for
    models.backbones.swin.SwinTransformer.

    Combines the reference's swin_convert key remap (convert_ckpt.py:4-57)
    with the flax layout transforms. Keys missing from the checkpoint (the
    per-stage output norms of the dense-prediction variant) are left out -
    merge over init params with ``merge_params``.
    """
    sd = {k[7:] if k.startswith("module.") else k: np.asarray(v)
          for k, v in sd.items() if not k.startswith("head")}
    params: Dict[str, Any] = {}

    params["patch_embed"] = {
        "projection": {
            "kernel": conv_kernel(sd["patch_embed.proj.weight"]),
            "bias": sd["patch_embed.proj.bias"],
        },
        "norm": ln_params(sd, "patch_embed.norm"),
    }

    target_table_len = (2 * window_size - 1) ** 2
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"layers.{i}.blocks.{j}"
            params[f"stage{i}_block{j}"] = {
                "norm1": ln_params(sd, p + ".norm1"),
                "norm2": ln_params(sd, p + ".norm2"),
                "attn": {
                    "qkv": {
                        "kernel": dense_kernel(sd[p + ".attn.qkv.weight"]),
                        "bias": sd[p + ".attn.qkv.bias"],
                    },
                    "proj": {
                        "kernel": dense_kernel(sd[p + ".attn.proj.weight"]),
                        "bias": sd[p + ".attn.proj.bias"],
                    },
                    "relative_position_bias_table": resize_rel_pos_table(
                        sd[p + ".attn.relative_position_bias_table"],
                        target_table_len,
                    ),
                },
                "ffn_fc1": {
                    "kernel": dense_kernel(sd[p + ".mlp.fc1.weight"]),
                    "bias": sd[p + ".mlp.fc1.bias"],
                },
                "ffn_fc2": {
                    "kernel": dense_kernel(sd[p + ".mlp.fc2.weight"]),
                    "bias": sd[p + ".mlp.fc2.bias"],
                },
            }
        if f"layers.{i}.downsample.reduction.weight" in sd:
            w = correct_unfold_reduction_order(
                sd[f"layers.{i}.downsample.reduction.weight"]
            )
            norm_w = correct_unfold_norm_order(
                sd[f"layers.{i}.downsample.norm.weight"]
            )
            norm_b = correct_unfold_norm_order(
                sd[f"layers.{i}.downsample.norm.bias"]
            )
            params[f"downsample{i}"] = {
                "reduction": {"kernel": dense_kernel(w)},
                "norm": {"scale": norm_w, "bias": norm_b},
            }
    return params


def convert_swin_mmcv(
    sd: Dict[str, np.ndarray],
    depths: Tuple[int, ...] = (2, 2, 18, 2),
    prefix: str = "",
) -> Dict[str, Any]:
    """mmcv-named Swin weights (the reference's own trained checkpoints,
    ``depth_backbone.stages.*``) -> flax params. Unlike the official layout
    these already use unfold ordering and carry per-stage norms."""
    sd = {k[len(prefix):]: np.asarray(v) for k, v in sd.items()
          if k.startswith(prefix)}
    params: Dict[str, Any] = {
        "patch_embed": {
            "projection": {
                "kernel": conv_kernel(sd["patch_embed.projection.weight"]),
                "bias": sd["patch_embed.projection.bias"],
            },
            "norm": ln_params(sd, "patch_embed.norm"),
        }
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            p = f"stages.{i}.blocks.{j}"
            params[f"stage{i}_block{j}"] = {
                "norm1": ln_params(sd, p + ".norm1"),
                "norm2": ln_params(sd, p + ".norm2"),
                "attn": {
                    "qkv": {
                        "kernel": dense_kernel(sd[p + ".attn.w_msa.qkv.weight"]),
                        "bias": sd[p + ".attn.w_msa.qkv.bias"],
                    },
                    "proj": {
                        "kernel": dense_kernel(sd[p + ".attn.w_msa.proj.weight"]),
                        "bias": sd[p + ".attn.w_msa.proj.bias"],
                    },
                    "relative_position_bias_table": sd[
                        p + ".attn.w_msa.relative_position_bias_table"
                    ],
                },
                "ffn_fc1": {
                    "kernel": dense_kernel(sd[p + ".ffn.layers.0.0.weight"]),
                    "bias": sd[p + ".ffn.layers.0.0.bias"],
                },
                "ffn_fc2": {
                    "kernel": dense_kernel(sd[p + ".ffn.layers.1.weight"]),
                    "bias": sd[p + ".ffn.layers.1.bias"],
                },
            }
        if f"stages.{i}.downsample.reduction.weight" in sd:
            params[f"downsample{i}"] = {
                "reduction": {
                    "kernel": dense_kernel(
                        sd[f"stages.{i}.downsample.reduction.weight"]
                    )
                },
                "norm": ln_params(sd, f"stages.{i}.downsample.norm"),
            }
        if f"norm{i}.weight" in sd:
            params[f"norm{i}"] = ln_params(sd, f"norm{i}")
    return params


# ------------------------------------------------------------------- merge


def merge_params(init_params: Dict, converted: Dict) -> Dict:
    """Overlay converted weights onto an init tree (strict=False semantics,
    reference swin.py:754 load_state_dict(..., False)); shapes must match
    where keys overlap."""
    out = dict(init_params)
    for k, v in converted.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_params(out[k], v)
        else:
            if k in out:
                a = np.asarray(out[k])
                b = np.asarray(v)
                if a.shape != b.shape:
                    raise ValueError(f"shape mismatch at {k}: {a.shape} vs {b.shape}")
            out[k] = v
    return out


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Read a .pt/.pth state dict into numpy (handles 'state_dict'/'model'/
    'net' wrappers like reference swin.py:703-709, main.py:418)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("state_dict", "model", "net"):
        if isinstance(ckpt, dict) and key in ckpt:
            ckpt = ckpt[key]
            break
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}
