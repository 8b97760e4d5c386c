"""Full reference-checkpoint conversion: synthesize a torch-layout state dict
for a tiny Swin+ADDHAHI model, convert, merge, and run the model — every
mapped leaf must be replaced and the forward stays finite."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.utils.convert_torch_checkpoint import (
    convert_reference_model,
    merge_params,
)

RNG = np.random.RandomState(0)


def _t(shape):
    return RNG.randn(*shape).astype(np.float32) * 0.05


def _bn(sd, prefix, c):
    sd[prefix + ".weight"] = np.abs(_t((c,))) + 0.5
    sd[prefix + ".bias"] = _t((c,))
    sd[prefix + ".running_mean"] = _t((c,))
    sd[prefix + ".running_var"] = np.abs(_t((c,))) + 0.5


def _ln(sd, prefix, c):
    sd[prefix + ".weight"] = np.abs(_t((c,))) + 0.5
    sd[prefix + ".bias"] = _t((c,))


def _synth_reference_sd(depths=(2, 2, 6, 2), dims=(96, 192, 384, 768),
                        heads=(3, 6, 12, 24), win=7, fpn=256, e=512, hid=16):
    """Reference (torch) key layout for swin-tiny + DDIMDepthEstimate_Swin_ADDHAHI."""
    sd = {}
    bb = "depth_backbone"
    sd[f"{bb}.patch_embed.projection.weight"] = _t((dims[0], 3, 4, 4))
    sd[f"{bb}.patch_embed.projection.bias"] = _t((dims[0],))
    _ln(sd, f"{bb}.patch_embed.norm", dims[0])
    for i, (dep, d, h) in enumerate(zip(depths, dims, heads)):
        for j in range(dep):
            p = f"{bb}.stages.{i}.blocks.{j}"
            _ln(sd, p + ".norm1", d)
            _ln(sd, p + ".norm2", d)
            sd[p + ".attn.w_msa.qkv.weight"] = _t((3 * d, d))
            sd[p + ".attn.w_msa.qkv.bias"] = _t((3 * d,))
            sd[p + ".attn.w_msa.proj.weight"] = _t((d, d))
            sd[p + ".attn.w_msa.proj.bias"] = _t((d,))
            sd[p + ".attn.w_msa.relative_position_bias_table"] = _t(
                (((2 * win - 1) ** 2), h))
            sd[p + ".ffn.layers.0.0.weight"] = _t((4 * d, d))
            sd[p + ".ffn.layers.0.0.bias"] = _t((4 * d,))
            sd[p + ".ffn.layers.1.weight"] = _t((d, 4 * d))
            sd[p + ".ffn.layers.1.bias"] = _t((d,))
        if i < len(depths) - 1:
            sd[f"{bb}.stages.{i}.downsample.reduction.weight"] = _t(
                (2 * dims[i], 4 * dims[i]))
            _ln(sd, f"{bb}.stages.{i}.downsample.norm", 4 * dims[i])
        _ln(sd, f"{bb}.norm{i}", d)

    hd = "depth_head"
    for i in range(4):
        sd[f"{hd}.conv_lateral.{i}.0.weight"] = _t((fpn, dims[i], 3, 3))
        _bn(sd, f"{hd}.conv_lateral.{i}.1", fpn)
    for i in range(3):
        sd[f"{hd}.conv_up.{i}.0.weight"] = _t((fpn, fpn, 2, 2))
        _bn(sd, f"{hd}.conv_up.{i}.1", fpn)

    dt = f"{hd}.depth_transform"
    sd[f"{dt}.conv_transform.0.0.weight"] = _t((hid, 1, 3, 3))
    _bn(sd, f"{dt}.conv_transform.0.1", hid)
    sd[f"{dt}.conv_transform.1.0.weight"] = _t((hid, hid, 3, 3))
    _bn(sd, f"{dt}.conv_transform.1.1", hid)
    sd[f"{dt}.conv_inv_transform.0.weight"] = _t((hid, hid, 4, 4))
    sd[f"{dt}.conv_inv_transform.0.bias"] = _t((hid,))
    _bn(sd, f"{dt}.conv_inv_transform.1", hid)
    sd[f"{dt}.conv_inv_transform.3.0.weight"] = _t((1, hid, 3, 3))
    sd[f"{dt}.conv_inv_transform.3.0.bias"] = _t((1,))

    dn = f"{hd}.model"
    sd[f"{dn}.time_embedding.weight"] = _t((1280, fpn))
    for blk, cin, cout in ((f"{dn}.noise_embedding", hid, fpn),
                           (f"{dn}.pred", fpn, hid)):
        sd[blk + ".0.weight"] = _t((64, cin, 3, 3))
        sd[blk + ".0.bias"] = _t((64,))
        sd[blk + ".1.weight"] = np.abs(_t((64,))) + 0.5
        sd[blk + ".1.bias"] = _t((64,))
        sd[blk + ".3.weight"] = _t((cout, 64, 3, 3))
        sd[blk + ".3.bias"] = _t((cout,))
        sd[blk + ".4.weight"] = np.abs(_t((cout,))) + 0.5
        sd[blk + ".4.bias"] = _t((cout,))
    for c in ("convA", "convB"):
        sd[f"{dn}.upsample_add.{c}.conv.weight"] = _t((fpn, fpn, 3, 3))
        sd[f"{dn}.upsample_add.{c}.conv.bias"] = _t((fpn,))

    hh = f"{hd}.hahineck"
    for i in range(4):
        sd[f"{hh}.lateral_convs.{i}.conv.weight"] = _t((dims[i], dims[i], 1, 1))
        sd[f"{hh}.lateral_convs.{i}.conv.bias"] = _t((dims[i],))
        _bn(sd, f"{hh}.lateral_convs.{i}.bn", dims[i])
    for i in range(3):
        sd[f"{hh}.trans_proj.{i}.conv.weight"] = _t((e, dims[i + 1], 1, 1))
        sd[f"{hh}.trans_proj.{i}.conv.bias"] = _t((e,))
        _bn(sd, f"{hh}.trans_proj.{i}.bn", e)
        sd[f"{hh}.trans_fusion.{i}.conv.weight"] = _t(
            (dims[i + 1], dims[i + 1] + e, 3, 3))
        sd[f"{hh}.trans_fusion.{i}.conv.bias"] = _t((dims[i + 1],))
        _bn(sd, f"{hh}.trans_fusion.{i}.bn", dims[i + 1])
    sd[f"{hh}.conv_proj.0.conv.weight"] = _t((e, dims[0], 1, 1))
    sd[f"{hh}.conv_proj.0.conv.bias"] = _t((e,))
    _bn(sd, f"{hh}.conv_proj.0.bn", e)
    sd[f"{hh}.conv_fusion.0.conv.weight"] = _t((dims[0], dims[0] + e, 3, 3))
    sd[f"{hh}.conv_fusion.0.conv.bias"] = _t((dims[0],))
    _bn(sd, f"{hh}.conv_fusion.0.bn", dims[0])
    return sd


@pytest.mark.slow
def test_full_model_conversion_roundtrip():
    cfg = Config(
        model_name="Diffusion_DCbase_", backbone_module="swin",
        backbone_name="swin_tiny", head_specify="DDIMDepthEstimate_Swin_ADDHAHI",
        inference_steps=2, patch_height=32, patch_width=48,
    ).finalize()
    # swin_tiny head has in_channels (192,...) by default; build with the
    # tiny pyramid channels via the ADDHAHI class field — the head reads
    # in_channels from its own definition, so use the Swin-L-channel head
    # only with matching dims. For the test, swin_tiny dims (96,192,384,768):
    from diffusiondepth_tpu.models.diffusion_model import Diffusion_DCbase_Model
    from diffusiondepth_tpu.models.heads.ddim_head import DDIMDepthEstimateHead
    from diffusiondepth_tpu.registry import HEADS

    from typing import Sequence

    if "TinyADDHAHI" not in HEADS:
        @HEADS.register(name="TinyADDHAHI")
        class TinyADDHAHI(DDIMDepthEstimateHead):
            in_channels: Sequence[int] = (96, 192, 384, 768)
            fuse: str = "upsample_add"
            use_hahi: bool = True

    model = Diffusion_DCbase_Model(
        backbone_name="swin_tiny", backbone_module="swin",
        head_name="TinyADDHAHI", inference_steps=2,
    )
    gt = np.ones((1, 32, 48, 1), np.float32) * 5
    batch = {
        "rgb": jnp.zeros((1, 32, 48, 3)), "dep": jnp.asarray(gt),
        "gt": jnp.asarray(gt), "depth_map": jnp.asarray(gt),
        "depth_mask": jnp.asarray(gt),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )

    sd = _synth_reference_sd()
    params, stats = convert_reference_model(sd, swin_depths=(2, 2, 6, 2))
    merged_p = merge_params(flax.core.unfreeze(variables["params"]), params)
    merged_s = merge_params(flax.core.unfreeze(variables["batch_stats"]), stats)

    # every converted leaf must have replaced its init value
    flat_conv = flax.traverse_util.flatten_dict(params, sep="/")
    flat_merged = flax.traverse_util.flatten_dict(merged_p, sep="/")
    flat_init = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables["params"]), sep="/")
    replaced = sum(
        1 for k in flat_conv
        if k in flat_init and not np.allclose(flat_merged[k], flat_init[k])
    )
    assert replaced > 100, f"only {replaced} leaves replaced"
    # and nothing was silently dropped relative to our tree
    missing = [k for k in flat_conv if k not in flat_init]
    assert not missing, f"converter produced unknown paths: {missing[:5]}"

    out = model.apply(
        {"params": merged_p, "batch_stats": merged_s}, batch, train=False,
        rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    assert np.all(np.isfinite(np.asarray(out["pred"])))
