"""Full-composite golden parity: the converted flax head vs a pure-torch
re-execution of the REFERENCE head math on the same synthesized state dict.

The reference flagship head (ddim_depth_estimate_res_swin_addHAHI.py:87-185)
is, module by module, expressible in plain ``torch.nn.functional`` (conv2d /
batch_norm / group_norm / interpolate / conv_transpose2d) — no mmcv needed.
This test re-executes exactly that math for:

  * depth transform ``t`` / ``inv_t`` (ops/depth_transform.py:10-35)
  * the HAHI conv path (necks/hahi.py:165-275 with self/cross att off,
    the shipped config :54-56)
  * FPN top-down collapse (:112-122)
  * ``ScheduledCNNRefine`` (:336-381) incl. ``UpSample_add`` fusion
  * a full 4-step DDIM sample with a FIXED initial latent, stepping with the
    reference's own vendored scheduler (scheduling_ddim.py, imported directly)

and asserts the converted flax model (convert_reference_model +
DDIMDepthEstimateHead) reproduces the final metric depth. Any drift in a
converter layout rule or a module forward fails this test.
"""

import importlib.util
import os

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diffusiondepth_tpu.models.heads.ddim_head import DDIMDepthEstimateHead
from diffusiondepth_tpu.utils.convert_torch_checkpoint import (
    convert_reference_model,
    merge_params,
)

from test_convert_full_model import _synth_reference_sd

REF_SCHED = "/root/reference/src/model/diffusers/schedulers/scheduling_ddim.py"

DIMS = (96, 192, 384, 768)
FPN = 256
HID = 16
STEPS = 4


@pytest.fixture(scope="module")
def ref_sched_mod():
    if not os.path.exists(REF_SCHED):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_sched_composite", REF_SCHED)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ------------------------------------------------------------------ torch
# pure-F re-execution of the reference modules (eval mode: BN running stats)


def _tt(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _conv(sd, p, x, stride=1, pad=0):
    b = _tt(sd[p + ".bias"]) if (p + ".bias") in sd else None
    return F.conv2d(x, _tt(sd[p + ".weight"]), b, stride=stride, padding=pad)


def _bn(sd, p, x):
    return F.batch_norm(
        x, _tt(sd[p + ".running_mean"]), _tt(sd[p + ".running_var"]),
        _tt(sd[p + ".weight"]), _tt(sd[p + ".bias"]), training=False, eps=1e-5,
    )


def _cmod(sd, p, x, pad=0):
    """mmcv ConvModule(conv, BN, ReLU) (hahi.py:56-97)."""
    return F.relu(_bn(sd, p + ".bn", _conv(sd, p + ".conv", x, 1, pad)))


def torch_dt_t(sd, depth):
    """DeepDepthTransformWithUpsampling.t (depth_transform.py:15-31):
    conv_bn_relu(1,h,3,2,1) -> conv_bn_relu(h,h,3,1,1,relu=False) -> Tanh.
    conv_bn_relu uses LeakyReLU(0.2) (common.py:45-60)."""
    d = "depth_head.depth_transform"
    x = _conv(sd, d + ".conv_transform.0.0", depth, stride=2, pad=1)
    x = F.leaky_relu(_bn(sd, d + ".conv_transform.0.1", x), 0.2)
    x = _conv(sd, d + ".conv_transform.1.0", x, 1, 1)
    x = _bn(sd, d + ".conv_transform.1.1", x)
    return torch.tanh(x)


def torch_dt_inv(sd, v, eps=1e-6):
    """inv_t (depth_transform.py:20-35): deconv(4,2,1) BN ReLU ->
    conv(3,1,1,bias) -> Sigmoid; 1/clamp(eps) - 1."""
    d = "depth_head.depth_transform"
    x = F.conv_transpose2d(
        v, _tt(sd[d + ".conv_inv_transform.0.weight"]),
        _tt(sd[d + ".conv_inv_transform.0.bias"]), stride=2, padding=1,
    )
    x = F.relu(_bn(sd, d + ".conv_inv_transform.1", x))
    x = _conv(sd, d + ".conv_inv_transform.3.0", x, 1, 1)
    return 1.0 / torch.sigmoid(x).clamp(eps) - 1.0


def torch_hahi(sd, fp):
    """HAHI conv path, attention bypassed (hahi.py:165-275 with
    self_att=False / cross_att=False: src == flattened projections, query ==
    conv_skip, so the un/refold is the identity)."""
    hh = "depth_head.hahineck"
    feats = [_cmod(sd, f"{hh}.lateral_convs.{i}", fp[i]) for i in range(4)]
    feat_conv, feats_trans = feats[0], feats[1:]
    srcs = [_cmod(sd, f"{hh}.trans_proj.{i}", feats_trans[i]) for i in range(3)]
    conv_skip = _cmod(sd, f"{hh}.conv_proj.0", feat_conv)
    out0 = _cmod(sd, f"{hh}.conv_fusion.0",
                 torch.cat([conv_skip, feat_conv], 1), pad=1)
    outs = [out0]
    for i in range(3):
        outs.append(_cmod(sd, f"{hh}.trans_fusion.{i}",
                          torch.cat([feats_trans[i], srcs[i]], 1), pad=1))
    return outs


def torch_fpn(sd, fp):
    """Top-down FPN collapse (addHAHI.py:112-122): lateral conv(bias=False)
    BN ReLU; deconv(2,2,bias=False) BN ReLU up-path; adaptive-avg-pool add."""
    hd = "depth_head"
    n = len(fp)
    x = None
    for i in range(n):
        j = n - 1 - i
        lat = F.relu(_bn(sd, f"{hd}.conv_lateral.{j}.1",
                         _conv(sd, f"{hd}.conv_lateral.{j}.0", fp[j], 1, 1)))
        if i > 0:
            up = F.conv_transpose2d(
                x, _tt(sd[f"{hd}.conv_up.{j}.0.weight"]), None, stride=2)
            up = F.relu(_bn(sd, f"{hd}.conv_up.{j}.1", up))
            lat = lat + F.adaptive_avg_pool2d(up, lat.shape[-2:])
        x = lat
    return x


def _gn_block(sd, p, x):
    """Sequential(conv GN(4) ReLU conv GN(4) ReLU) (addHAHI.py:339-359)."""
    x = _conv(sd, p + ".0", x, 1, 1)
    x = F.relu(F.group_norm(x, 4, _tt(sd[p + ".1.weight"]),
                            _tt(sd[p + ".1.bias"]), eps=1e-5))
    x = _conv(sd, p + ".3", x, 1, 1)
    x = F.relu(F.group_norm(x, 4, _tt(sd[p + ".4.weight"]),
                            _tt(sd[p + ".4.bias"]), eps=1e-5))
    return x


def torch_denoiser(sd, noisy, t_scalar, cond):
    """ScheduledCNNRefine.forward (addHAHI.py:361-381): cond + time embed,
    UpSample_add(feat, noise_embedding(noisy)) with align_corners=True
    bilinear (:332), two plain convs, pred block."""
    dn = "depth_head.model"
    te = _tt(sd[dn + ".time_embedding.weight"])[int(t_scalar)]
    feat = cond + te[None, :, None, None]
    ne = _gn_block(sd, dn + ".noise_embedding", noisy)
    up = F.interpolate(feat, size=ne.shape[-2:], mode="bilinear",
                       align_corners=True)
    h = _conv(sd, dn + ".upsample_add.convA.conv", up + ne, 1, 1)
    h = _conv(sd, dn + ".upsample_add.convB.conv", h, 1, 1)
    return _gn_block(sd, dn + ".pred", h)


def torch_composite(sd, fp, gt, latent0, ref_sched_mod):
    """The full reference head forward (addHAHI.py:87-146) with a fixed
    initial latent; returns (gt_map_t, condition x, refined depth)."""
    gt_map_t = torch_dt_t(sd, gt)
    fp = torch_hahi(sd, fp)
    x = torch_fpn(sd, fp)

    sched = ref_sched_mod.DDIMScheduler(num_train_timesteps=1000,
                                        clip_sample=False)
    sched.set_timesteps(STEPS)
    image = latent0.clone()
    for t in sched.timesteps:
        eps = torch_denoiser(sd, image, t, x)
        image = sched.step(eps, t, image, eta=0.0,
                           use_clipped_model_output=True)["prev_sample"]
    return gt_map_t, x, torch_dt_inv(sd, image)


# ------------------------------------------------------------ torch Swin
# pure-F re-execution of the reference mmcv Swin backbone
# (src/model/backbone/swin.py: WindowMSA :150-189, ShiftWindowMSA :250-325,
# SwinBlock :426-437, PatchMerging :64-88, SwinTransformer.forward :756-777;
# PatchEmbedSwin utils.py:282-302). Eval mode: all dropouts/drop-path off.


def _ln(sd, p, x, eps=1e-5):
    return F.layer_norm(x, (x.shape[-1],), _tt(sd[p + ".weight"]),
                        _tt(sd[p + ".bias"]), eps=eps)


def _win_part_t(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws * ws, C)


def _win_rev_t(wins, ws, H, W):
    B = int(wins.shape[0] / (H * W / ws / ws))
    x = wins.view(B, H // ws, W // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, H, W, -1)


def _rel_pos_index_t(ws):
    """mmcv double_step_seq construction (swin.py:133-138,191-195)."""
    seq1 = torch.arange(0, (2 * ws - 1) * ws, 2 * ws - 1)
    seq2 = torch.arange(0, ws)
    coords = (seq1[:, None] + seq2[None, :]).reshape(1, -1)
    return (coords + coords.T).flip(1)


def _wmsa_t(sd, p, x, heads, ws, mask):
    """WindowMSA.forward (swin.py:150-189); x: (nW*B, N, C)."""
    B, N, C = x.shape
    qkv = x @ _tt(sd[p + ".qkv.weight"]).T + _tt(sd[p + ".qkv.bias"])
    qkv = qkv.reshape(B, N, 3, heads, C // heads).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    q = q * (C // heads) ** -0.5
    attn = q @ k.transpose(-2, -1)
    idx = _rel_pos_index_t(ws).reshape(-1)
    table = _tt(sd[p + ".relative_position_bias_table"])
    attn = attn + table[idx].reshape(N, N, heads).permute(2, 0, 1).unsqueeze(0)
    if mask is not None:
        nW = mask.shape[0]
        attn = attn.view(B // nW, nW, heads, N, N) + mask[None, :, None]
        attn = attn.view(-1, heads, N, N)
    attn = torch.softmax(attn, -1)
    x = (attn @ v).transpose(1, 2).reshape(B, N, C)
    return x @ _tt(sd[p + ".proj.weight"]).T + _tt(sd[p + ".proj.bias"])


def _shift_msa_t(sd, p, x, hw, heads, ws, shift):
    """ShiftWindowMSA.forward (swin.py:250-325); x: (B, H*W, C)."""
    B, L, C = x.shape
    H, W = hw
    x = x.view(B, H, W, C)
    pad_r = (ws - W % ws) % ws
    pad_b = (ws - H % ws) % ws
    x = F.pad(x, (0, 0, 0, pad_r, 0, pad_b))
    Hp, Wp = x.shape[1], x.shape[2]
    if shift > 0:
        x = torch.roll(x, (-shift, -shift), (1, 2))
        img_mask = torch.zeros((1, Hp, Wp, 1))
        cnt = 0
        for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
                img_mask[:, hs, vs, :] = cnt
                cnt += 1
        mw = _win_part_t(img_mask, ws).view(-1, ws * ws)
        mask = mw.unsqueeze(1) - mw.unsqueeze(2)
        mask = mask.masked_fill(mask != 0, -100.0).masked_fill(mask == 0, 0.0)
    else:
        mask = None
    wins = _wmsa_t(sd, p, _win_part_t(x, ws), heads, ws, mask)
    x = _win_rev_t(wins.view(-1, ws, ws, C), ws, Hp, Wp)
    if shift > 0:
        x = torch.roll(x, (shift, shift), (1, 2))
    return x[:, :H, :W, :].contiguous().view(B, H * W, C)


def _patch_merge_t(sd, p, x, hw):
    """PatchMerging.forward (swin.py:64-88)."""
    B, L, C = x.shape
    H, W = hw
    x = x.view(B, H, W, C).permute(0, 3, 1, 2)
    if H % 2 or W % 2:
        x = F.pad(x, (0, W % 2, 0, H % 2))
    x = F.unfold(x, 2, stride=2).transpose(1, 2)  # B, L/4, 4C
    x = _ln(sd, p + ".norm", x)
    return x @ _tt(sd[p + ".reduction.weight"]).T, ((H + 1) // 2, (W + 1) // 2)


def torch_swin(sd, img, depths=(2, 2, 6, 2), heads=(3, 6, 12, 24), ws=7):
    """SwinTransformer.forward (swin.py:756-777): patch embed -> stages of
    [norm1 -> ShiftWindowMSA -> +id; norm2 -> FFN -> +id] -> per-stage output
    LN -> NCHW pyramid. FFN = Linear/GELU/Linear (mmcv FFN, add_identity)."""
    bb = "depth_backbone"
    H, W = img.shape[2], img.shape[3]
    if H % 4:
        img = F.pad(img, (0, 0, 0, 4 - H % 4))
    if W % 4:
        img = F.pad(img, (0, 4 - W % 4, 0, 0))
    x = F.conv2d(img, _tt(sd[f"{bb}.patch_embed.projection.weight"]),
                 _tt(sd[f"{bb}.patch_embed.projection.bias"]), stride=4)
    hw = (x.shape[2], x.shape[3])
    x = x.flatten(2).transpose(1, 2)
    x = _ln(sd, f"{bb}.patch_embed.norm", x)

    outs = []
    for i, dep in enumerate(depths):
        for j in range(dep):
            p = f"{bb}.stages.{i}.blocks.{j}"
            idt = x
            y = _ln(sd, p + ".norm1", x)
            y = _shift_msa_t(sd, p + ".attn.w_msa", y, hw, heads[i], ws,
                             ws // 2 if j % 2 else 0)
            x = y + idt
            idt = x
            y = _ln(sd, p + ".norm2", x)
            y = F.gelu(y @ _tt(sd[p + ".ffn.layers.0.0.weight"]).T
                       + _tt(sd[p + ".ffn.layers.0.0.bias"]))
            x = idt + (y @ _tt(sd[p + ".ffn.layers.1.weight"]).T
                       + _tt(sd[p + ".ffn.layers.1.bias"]))
        out = _ln(sd, f"{bb}.norm{i}", x)
        outs.append(out.view(-1, *hw, out.shape[-1]).permute(0, 3, 1, 2))
        if i < len(depths) - 1:
            x, hw = _patch_merge_t(sd, f"{bb}.stages.{i}.downsample", x, hw)
    return outs


# ------------------------------------------------------------------- test


def test_composite_head_matches_reference_math(ref_sched_mod):
    rng = np.random.RandomState(42)
    b, gh, gw = 1, 32, 48
    gt = np.abs(rng.randn(b, 1, gh, gw)).astype(np.float32) * 8 + 1
    shapes = [(8, 12), (4, 6), (2, 3), (1, 2)]
    fp_nchw = [rng.randn(b, c, h, w).astype(np.float32) * 0.5
               for c, (h, w) in zip(DIMS, shapes)]
    latent0 = rng.randn(b, HID, gh // 2, gw // 2).astype(np.float32)

    sd = _synth_reference_sd(depths=(2, 2, 6, 2), dims=DIMS, fpn=FPN, hid=HID)

    # ---- torch (reference math)
    with torch.no_grad():
        ref_gt_t, ref_cond, ref_pred = torch_composite(
            sd, [_tt(f) for f in fp_nchw], _tt(gt), _tt(latent0), ref_sched_mod
        )

    # ---- flax (converted)
    head = DDIMDepthEstimateHead(
        in_channels=DIMS, fuse="upsample_add", use_hahi=True,
        inference_steps=STEPS,
    )
    fp_nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in fp_nchw]
    gt_nhwc = jnp.asarray(gt.transpose(0, 2, 3, 1))
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        fp_nhwc, gt_depth_map=gt_nhwc, train=False,
    )
    params, stats = convert_reference_model(sd, swin_depths=(2, 2, 6, 2))
    merged_p = merge_params(
        flax.core.unfreeze(variables["params"]), params["depth_head"])
    merged_s = merge_params(
        flax.core.unfreeze(variables["batch_stats"]), stats["depth_head"])
    out = head.apply(
        {"params": merged_p, "batch_stats": merged_s},
        fp_nhwc, gt_depth_map=gt_nhwc, train=False, compute_ddim_loss=False,
        init_latent=jnp.asarray(latent0.transpose(0, 2, 3, 1)),
    )

    # encoded GT latent (depth transform t)
    np.testing.assert_allclose(
        np.asarray(out["gt_map_t"]).transpose(0, 3, 1, 2),
        ref_gt_t.numpy(), rtol=1e-4, atol=1e-5,
    )
    # final metric depth through HAHI + FPN + 4 DDIM steps + inv_t
    np.testing.assert_allclose(
        np.asarray(out["pred"]).transpose(0, 3, 1, 2),
        ref_pred.numpy(), rtol=1e-3, atol=1e-3,
    )


@pytest.mark.slow
def test_full_model_with_swin_backbone_matches_reference_math(ref_sched_mod):
    """The strongest no-data parity proof: a converted FULL model — Swin
    backbone INCLUDED — vs a pure-torch re-execution of the whole reference
    forward (diffusion_dcbase_model.py:112-134: backbone -> HAHI -> FPN ->
    4 DDIM steps -> inv_t) on one synthesized state dict. A 32x48 input gives
    an 8x12 token grid: window-7 attention pads every stage (14x14 / 7x7) and
    the 2x3->1x2 merge exercises the odd-size PatchMerging pad, so any drift
    in Swin math, a backbone-converter layout rule, or the head pipeline
    fails here."""
    from diffusiondepth_tpu.models.diffusion_model import Diffusion_DCbase_Model

    rng = np.random.RandomState(3)
    b, ih, iw = 1, 32, 48
    img = rng.randn(b, 3, ih, iw).astype(np.float32)
    gt = np.abs(rng.randn(b, 1, ih, iw)).astype(np.float32) * 8 + 1
    latent0 = rng.randn(b, HID, ih // 2, iw // 2).astype(np.float32)
    depths, dims = (2, 2, 6, 2), DIMS

    sd = _synth_reference_sd(depths=depths, dims=dims, fpn=FPN, hid=HID)

    # ---- torch (reference math, end to end)
    with torch.no_grad():
        fp_t = torch_swin(sd, _tt(img), depths=depths)
        ref_gt_t, _, ref_pred = torch_composite(
            sd, fp_t, _tt(gt), _tt(latent0), ref_sched_mod
        )

    # ---- flax (converted full model)
    model = Diffusion_DCbase_Model(
        backbone_name="swin_tiny", backbone_module="swin",
        head_name="DDIMDepthEstimate_Swin_ADDHAHI",
        head_in_channels=dims, inference_steps=STEPS,
    )
    gt_nhwc = jnp.asarray(gt.transpose(0, 2, 3, 1))
    batch = {
        "rgb": jnp.asarray(img.transpose(0, 2, 3, 1)),
        "dep": gt_nhwc, "gt": gt_nhwc, "depth_map": gt_nhwc,
        "depth_mask": jnp.ones_like(gt_nhwc),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    params, stats = convert_reference_model(sd, swin_depths=depths)
    merged_p = merge_params(flax.core.unfreeze(variables["params"]), params)
    merged_s = merge_params(flax.core.unfreeze(variables["batch_stats"]), stats)

    # backbone pyramid parity first (localises converter/Swin-math drift)
    from diffusiondepth_tpu.registry import BACKBONES

    bb = BACKBONES.get("swin_tiny")()
    fp_j = bb.apply({"params": merged_p["depth_backbone"]},
                    batch["rgb"], False)
    for lvl, (ours, ref) in enumerate(zip(fp_j, fp_t)):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(),
            rtol=2e-4, atol=2e-4, err_msg=f"backbone level {lvl}",
        )

    out = model.apply(
        {"params": merged_p, "batch_stats": merged_s}, batch, train=False,
        compute_ddim_loss=False,
        init_latent=jnp.asarray(latent0.transpose(0, 2, 3, 1)),
        rngs={"diffusion": jax.random.PRNGKey(2)},
    )
    np.testing.assert_allclose(
        np.asarray(out["gt_map_t"]).transpose(0, 3, 1, 2),
        ref_gt_t.numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["pred"]).transpose(0, 3, 1, 2),
        ref_pred.numpy(), rtol=1e-3, atol=1e-3,
    )


def test_composite_res_head_matches_reference_math(ref_sched_mod):
    """Same protocol for the Res head family (direct-add fusion, no HAHI;
    reference ddim_depth_estimate_res.py:15,108-140 + denoiser :300-343):
    condition is bilinear-upsampled to latent resolution and added (our
    'add' fuse path resizes when resolutions differ)."""
    rng = np.random.RandomState(7)
    b, gh, gw = 1, 32, 48
    gt = np.abs(rng.randn(b, 1, gh, gw)).astype(np.float32) * 8 + 1
    res_dims = (64, 128, 256, 512)
    shapes = [(16, 24), (8, 12), (4, 6), (2, 3)]
    fp_nchw = [rng.randn(b, c, h, w).astype(np.float32) * 0.5
               for c, (h, w) in zip(res_dims, shapes)]
    latent0 = rng.randn(b, HID, gh // 2, gw // 2).astype(np.float32)

    sd = _synth_reference_sd(dims=res_dims, fpn=FPN, hid=HID)
    # Res-head denoiser has no UpSample_add convs (fusion is a direct add,
    # reference ddim_depth_estimate_res.py:324-343) and the Res model has no
    # HAHI neck - drop both module families from the synthetic state dict
    sd = {k: v for k, v in sd.items()
          if ".upsample_add." not in k and ".hahineck." not in k}

    with torch.no_grad():
        gt_t = torch_dt_t(sd, _tt(gt))
        x = torch_fpn(sd, [_tt(f) for f in fp_nchw])
        sched = ref_sched_mod.DDIMScheduler(num_train_timesteps=1000,
                                            clip_sample=False)
        sched.set_timesteps(STEPS)
        image = _tt(latent0)
        dn = "depth_head.model"
        for t in sched.timesteps:
            te = _tt(sd[dn + ".time_embedding.weight"])[int(t)]
            feat = x + te[None, :, None, None]
            # direct add: reference Res denoiser adds embeddings at the
            # latent resolution (condition already H/2 there); our head
            # resizes the condition once outside the scan - replicate by
            # resizing feat here (align_corners=True, resize.py semantics)
            feat = F.interpolate(feat, size=image.shape[-2:], mode="bilinear",
                                 align_corners=True)
            ne = _gn_block(sd, dn + ".noise_embedding", image)
            eps = _gn_block(sd, dn + ".pred", feat + ne)
            image = sched.step(eps, t, image, eta=0.0,
                               use_clipped_model_output=True)["prev_sample"]
        ref_pred = torch_dt_inv(sd, image)

    head = DDIMDepthEstimateHead(
        in_channels=res_dims, fuse="add", inference_steps=STEPS,
    )
    fp_nhwc = [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in fp_nchw]
    gt_nhwc = jnp.asarray(gt.transpose(0, 2, 3, 1))
    variables = head.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        fp_nhwc, gt_depth_map=gt_nhwc, train=False,
    )
    params, stats = convert_reference_model(sd, swin_depths=(2, 2, 6, 2))
    merged_p = merge_params(
        flax.core.unfreeze(variables["params"]), params["depth_head"])
    merged_s = merge_params(
        flax.core.unfreeze(variables["batch_stats"]), stats["depth_head"])
    out = head.apply(
        {"params": merged_p, "batch_stats": merged_s},
        fp_nhwc, gt_depth_map=gt_nhwc, train=False, compute_ddim_loss=False,
        init_latent=jnp.asarray(latent0.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(out["pred"]).transpose(0, 3, 1, 2),
        ref_pred.numpy(), rtol=1e-3, atol=1e-3,
    )
