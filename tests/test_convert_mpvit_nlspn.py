"""MPViT + NLSPN checkpoint conversion: synthesize reference-layout (torch)
state dicts, convert, and assert NUMERICAL parity against a pure-torch
re-execution of the reference math (mpvit.py / nlspnmodel.py are expressible
in plain torch.nn.functional). Also covers the MPViT ``norm_eval`` BN freeze
(reference mpvit.py:732-740)."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.models.backbones.mpvit import MPViT
from diffusiondepth_tpu.utils.convert_torch_checkpoint import (
    convert_mpvit,
    convert_reference_model,
    merge_params,
)

RNG = np.random.RandomState(3)


def _t(shape, scale=0.1):
    return RNG.randn(*shape).astype(np.float32) * scale


def _bn_sd(sd, p, c):
    sd[p + ".weight"] = np.abs(_t((c,))) + 0.5
    sd[p + ".bias"] = _t((c,))
    sd[p + ".running_mean"] = _t((c,))
    sd[p + ".running_var"] = np.abs(_t((c,))) + 0.5


def _ln_sd(sd, p, c):
    sd[p + ".weight"] = np.abs(_t((c,))) + 0.5
    sd[p + ".bias"] = _t((c,))


def _tt(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def _bn_t(sd, p, x):
    return F.batch_norm(
        x, _tt(sd[p + ".running_mean"]), _tt(sd[p + ".running_var"]),
        _tt(sd[p + ".weight"]), _tt(sd[p + ".bias"]), training=False, eps=1e-5,
    )


# ================================================================== MPViT

DIMS = (8, 16, 24, 32)
PATHS = (2, 2, 2, 2)
LAYERS = (1, 1, 1, 1)
HEADS = 8
MLP = 2
CRPE = ((3, 2), (5, 3), (7, 3))  # (window, head_split)


def _synth_mpvit_sd(dims=DIMS, paths=PATHS, layers=LAYERS, heads=HEADS,
                    mlp=MLP, prefix=""):
    """Reference torch key layout (mpvit.py:601-730)."""
    sd = {}
    sd[f"{prefix}stem.0.conv.weight"] = _t((dims[0] // 2, 3, 3, 3))
    _bn_sd(sd, f"{prefix}stem.0.bn", dims[0] // 2)
    sd[f"{prefix}stem.1.conv.weight"] = _t((dims[0], dims[0] // 2, 3, 3))
    _bn_sd(sd, f"{prefix}stem.1.bn", dims[0])

    for s in range(4):
        d = dims[s]
        out = dims[s + 1] if s + 1 < 4 else dims[s]
        ch = d // heads
        for p in range(paths[s]):
            b = f"{prefix}patch_embed_stages.{s}.patch_embeds.{p}.patch_conv"
            sd[b + ".dwconv.weight"] = _t((d, 1, 3, 3))
            sd[b + ".pwconv.weight"] = _t((d, d, 1, 1))
            _bn_sd(sd, b + ".bn", d)
        inv = f"{prefix}mhca_stages.{s}.InvRes"
        sd[inv + ".conv1.conv.weight"] = _t((d, d, 1, 1))
        _bn_sd(sd, inv + ".conv1.bn", d)
        sd[inv + ".dwconv.weight"] = _t((d, 1, 3, 3))
        _bn_sd(sd, inv + ".norm", d)
        sd[inv + ".conv2.conv.weight"] = _t((d, d, 1, 1))
        _bn_sd(sd, inv + ".conv2.bn", d)
        for p in range(paths[s]):
            enc = f"{prefix}mhca_stages.{s}.mhca_blks.{p}"
            sd[enc + ".cpe.proj.weight"] = _t((d, 1, 3, 3))
            sd[enc + ".cpe.proj.bias"] = _t((d,))
            for i, (win, split) in enumerate(CRPE):
                c = split * ch
                sd[f"{enc}.crpe.conv_list.{i}.weight"] = _t((c, 1, win, win))
                sd[f"{enc}.crpe.conv_list.{i}.bias"] = _t((c,))
            for l in range(layers[s]):
                blk = f"{enc}.MHCA_layers.{l}"
                _ln_sd(sd, blk + ".norm1", d)
                _ln_sd(sd, blk + ".norm2", d)
                sd[blk + ".factoratt_crpe.qkv.weight"] = _t((3 * d, d))
                sd[blk + ".factoratt_crpe.qkv.bias"] = _t((3 * d,))
                sd[blk + ".factoratt_crpe.proj.weight"] = _t((d, d))
                sd[blk + ".factoratt_crpe.proj.bias"] = _t((d,))
                sd[blk + ".mlp.fc1.weight"] = _t((mlp * d, d))
                sd[blk + ".mlp.fc1.bias"] = _t((mlp * d,))
                sd[blk + ".mlp.fc2.weight"] = _t((d, mlp * d))
                sd[blk + ".mlp.fc2.bias"] = _t((d,))
        agg = f"{prefix}mhca_stages.{s}.aggregate"
        sd[agg + ".conv.weight"] = _t((out, d * (paths[s] + 1), 1, 1))
        _bn_sd(sd, agg + ".bn", out)
    return sd


def _t_convbn(sd, key, x, stride=1, pad=0, groups=1, act=False):
    """Conv2d_BN (mpvit.py:85-122), eval mode."""
    x = F.conv2d(x, _tt(sd[key + ".conv.weight"]), None, stride, pad,
                 groups=groups)
    x = _bn_t(sd, key + ".bn", x)
    return F.hardswish(x) if act else x


def _t_crpe(sd, enc, q, v, size, ch):
    """ConvRelPosEnc (mpvit.py:262-330): per-head-group depthwise convs on
    the V map (head-major channel layout), times Q."""
    h_, w_ = size
    b, heads, n, _ = q.shape
    v_img = v.transpose(2, 3).reshape(b, heads * ch, h_, w_)
    outs, start = [], 0
    for i, (win, split) in enumerate(CRPE):
        c = split * ch
        part = v_img[:, start:start + c]
        start += c
        outs.append(F.conv2d(part, _tt(sd[f"{enc}.crpe.conv_list.{i}.weight"]),
                             _tt(sd[f"{enc}.crpe.conv_list.{i}.bias"]),
                             padding=win // 2, groups=c))
    conv_v = torch.cat(outs, 1).reshape(b, heads, ch, n).transpose(2, 3)
    return q * conv_v


def _t_block(sd, enc, blk, tok, d, heads, size):
    """MHCABlock (mpvit.py:396-436), drop_path identity."""
    ch = d // heads
    b, n, _ = tok.shape
    cur = F.layer_norm(tok, (d,), _tt(sd[blk + ".norm1.weight"]),
                       _tt(sd[blk + ".norm1.bias"]), eps=1e-6)
    qkv = F.linear(cur, _tt(sd[blk + ".factoratt_crpe.qkv.weight"]),
                   _tt(sd[blk + ".factoratt_crpe.qkv.bias"]))
    qkv = qkv.reshape(b, n, 3, heads, ch).permute(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    k_sm = k.softmax(dim=2)
    kv = torch.einsum("bhnk,bhnv->bhkv", k_sm, v)
    factor = torch.einsum("bhnk,bhkv->bhnv", q, kv)
    crpe = _t_crpe(sd, enc, q, v, size, ch)
    y = (ch ** -0.5) * factor + crpe
    y = y.transpose(1, 2).reshape(b, n, d)
    y = F.linear(y, _tt(sd[blk + ".factoratt_crpe.proj.weight"]),
                 _tt(sd[blk + ".factoratt_crpe.proj.bias"]))
    tok = tok + y
    cur = F.layer_norm(tok, (d,), _tt(sd[blk + ".norm2.weight"]),
                       _tt(sd[blk + ".norm2.bias"]), eps=1e-6)
    cur = F.gelu(F.linear(cur, _tt(sd[blk + ".mlp.fc1.weight"]),
                          _tt(sd[blk + ".mlp.fc1.bias"])))
    cur = F.linear(cur, _tt(sd[blk + ".mlp.fc2.weight"]),
                   _tt(sd[blk + ".mlp.fc2.bias"]))
    return tok + cur


def _t_encoder(sd, enc, x, d, n_layers, heads):
    """MHCAEncoder (mpvit.py:439-479): shared CPE applied inside each block."""
    b, _, h_, w_ = x.shape
    for l in range(n_layers):
        # ConvPosEnc (:241-259) on the map
        x = x + F.conv2d(x, _tt(sd[enc + ".cpe.proj.weight"]),
                         _tt(sd[enc + ".cpe.proj.bias"]), padding=1, groups=d)
        tok = x.flatten(2).transpose(1, 2)
        tok = _t_block(sd, enc, f"{enc}.MHCA_layers.{l}", tok, d, heads,
                       (h_, w_))
        x = tok.transpose(1, 2).reshape(b, d, h_, w_)
    return x


def torch_mpvit(sd, x, dims=DIMS, paths=PATHS, layers=LAYERS, heads=HEADS):
    """Full MPViT forward (mpvit.py:707-727), eval mode."""
    x = _t_convbn(sd, "stem.0", x, 1, 1, act=True)
    x = _t_convbn(sd, "stem.1", x, 1, 1, act=True)
    outs = []
    for s in range(4):
        d = dims[s]
        att = []
        for p in range(paths[s]):
            b = f"patch_embed_stages.{s}.patch_embeds.{p}.patch_conv"
            y = F.conv2d(x, _tt(sd[b + ".dwconv.weight"]), None,
                         2 if p == 0 else 1, 1, groups=d)
            y = F.conv2d(y, _tt(sd[b + ".pwconv.weight"]), None)
            x = F.hardswish(_bn_t(sd, b + ".bn", y))
            att.append(x)
        inv = f"mhca_stages.{s}.InvRes"
        y = _t_convbn(sd, inv + ".conv1", att[0], act=True)
        y = F.conv2d(y, _tt(sd[inv + ".dwconv.weight"]), None, 1, 1, groups=d)
        y = F.hardswish(_bn_t(sd, inv + ".norm", y))
        y = _t_convbn(sd, inv + ".conv2", y, act=False)
        path_outs = [att[0] + y]
        for p in range(paths[s]):
            path_outs.append(_t_encoder(
                sd, f"mhca_stages.{s}.mhca_blks.{p}", att[p], d, layers[s],
                heads))
        x = _t_convbn(sd, f"mhca_stages.{s}.aggregate",
                      torch.cat(path_outs, 1), act=True)
        outs.append(x)
    return outs


def _tiny_mpvit(**kw):
    return MPViT(num_path=PATHS, num_layers=LAYERS, embed_dims=DIMS,
                 mlp_ratios=(MLP,) * 4, num_heads=(HEADS,) * 4,
                 drop_path_rate=0.0, **kw)


@pytest.mark.slow
def test_mpvit_conversion_matches_torch_math():
    sd = _synth_mpvit_sd()
    x = RNG.randn(1, 3, 16, 24).astype(np.float32)

    with torch.no_grad():
        ref_outs = torch_mpvit(sd, _tt(x))

    model = _tiny_mpvit()
    x_nhwc = jnp.asarray(x.transpose(0, 2, 3, 1))
    variables = model.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    params, stats = convert_mpvit(sd)
    merged_p = merge_params(flax.core.unfreeze(variables["params"]), params)
    merged_s = merge_params(
        flax.core.unfreeze(variables["batch_stats"]), stats)

    # every converted leaf replaced, no unknown paths
    flat_conv = flax.traverse_util.flatten_dict(params, sep="/")
    flat_init = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables["params"]), sep="/")
    missing = [k for k in flat_conv if k not in flat_init]
    assert not missing, f"unknown paths: {missing[:5]}"
    assert len(flat_conv) == len(flat_init), (
        f"converter covered {len(flat_conv)} of {len(flat_init)} leaves")

    outs = model.apply({"params": merged_p, "batch_stats": merged_s},
                       x_nhwc, train=False)
    for ours, ref in zip(outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(),
            rtol=1e-4, atol=1e-4,
        )


def test_mpvit_full_model_dispatch():
    """depth_backbone.-prefixed MPViT keys route through
    convert_reference_model (the full-checkpoint entry point)."""
    sd = _synth_mpvit_sd(prefix="depth_backbone.")
    params, stats = convert_reference_model(sd)
    assert "stem0" in params["depth_backbone"]
    assert "stage3_aggregate" in params["depth_backbone"]
    assert "stage0_mhca0" in params["depth_backbone"]
    assert "bn" in stats["depth_backbone"]["stem0"]


def test_mpvit_norm_eval_freezes_bn():
    """norm_eval (reference mpvit.py:732-740): under train=True the BNs use
    running averages (output identical to eval) and batch_stats stay
    unchanged; with norm_eval=False they do neither."""
    x = jnp.asarray(RNG.randn(2, 16, 24, 3).astype(np.float32))
    model = _tiny_mpvit(norm_eval=True)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False)

    out_train, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    out_eval = model.apply(variables, x, train=False)
    for a, b in zip(out_train, out_eval):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for k, v in flax.traverse_util.flatten_dict(
            flax.core.unfreeze(mutated["batch_stats"]), sep="/").items():
        orig = flax.traverse_util.flatten_dict(
            flax.core.unfreeze(variables["batch_stats"]), sep="/")[k]
        np.testing.assert_array_equal(np.asarray(v), np.asarray(orig))

    model_nf = _tiny_mpvit(norm_eval=False)
    out_nf, mutated_nf = model_nf.apply(
        variables, x, train=True, mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)})
    changed = any(
        not np.allclose(np.asarray(v), np.asarray(
            flax.traverse_util.flatten_dict(
                flax.core.unfreeze(variables["batch_stats"]), sep="/")[k]))
        for k, v in flax.traverse_util.flatten_dict(
            flax.core.unfreeze(mutated_nf["batch_stats"]), sep="/").items()
    )
    assert changed, "norm_eval=False must update batch statistics"


# ================================================================== NLSPN

BLOCKS = (2, 2, 2, 2)  # resnet18
PLANES = (64, 128, 256, 512)
NUM_NEIGH = 8


def _w(shape):
    """Fan-in-scaled weight: keeps activations O(1) through the deep
    encoder/decoder so the f32 comparison is meaningful (unscaled random
    weights compound to ~1e6 magnitudes by the last conv)."""
    fan_in = int(np.prod(shape[1:]))
    return (RNG.randn(*shape) / np.sqrt(fan_in)).astype(np.float32)


def _synth_nlspn_sd():
    """Reference torch key layout (nlspnmodel.py:210-316)."""
    sd = {}

    def convbr(name, cin, cout, bn=True, bias=None):
        sd[name + ".0.weight"] = _w((cout, cin, 3, 3))
        if bias or not bn:
            sd[name + ".0.bias"] = _t((cout,))
        if bn:
            _bn_sd(sd, name + ".1", cout)

    convbr("conv1_rgb", 3, 48, bn=False)
    convbr("conv1_dep", 1, 16, bn=False)

    cin = 64
    for stage, planes, stride in zip(("conv2", "conv3", "conv4", "conv5"),
                                     PLANES, (1, 2, 2, 2)):
        for j in range(2):
            p = f"{stage}.{j}"
            c_in = cin if j == 0 else planes
            sd[p + ".conv1.weight"] = _w((planes, c_in, 3, 3))
            _bn_sd(sd, p + ".bn1", planes)
            sd[p + ".conv2.weight"] = _w((planes, planes, 3, 3))
            _bn_sd(sd, p + ".bn2", planes)
            if j == 0 and (stride != 1 or c_in != planes):
                sd[p + ".downsample.0.weight"] = _w((planes, c_in, 1, 1))
                _bn_sd(sd, p + ".downsample.1", planes)
        cin = planes

    convbr("conv6", 512, 512)
    for name, cin, cout in (("dec5", 512, 256), ("dec4", 768, 128),
                            ("dec3", 384, 64), ("dec2", 192, 64)):
        sd[name + ".0.weight"] = _w((cin, cout, 3, 3))  # ConvT: (I, O, kh, kw)
        _bn_sd(sd, name + ".1", cout)

    convbr("id_dec1", 128, 64)
    convbr("id_dec0", 128, 1, bn=False)
    convbr("gd_dec1", 128, 64)
    convbr("gd_dec0", 128, NUM_NEIGH, bn=False)
    convbr("cf_dec1", 128, 32)
    convbr("cf_dec0", 96, 1, bn=False)

    sd["prop_layer.conv_offset_aff.weight"] = _t((3 * NUM_NEIGH, NUM_NEIGH, 3, 3))
    sd["prop_layer.conv_offset_aff.bias"] = _t((3 * NUM_NEIGH,))
    sd["prop_layer.aff_scale_const"] = np.asarray([0.5 * NUM_NEIGH], np.float32)
    return sd


def _t_cbr(sd, name, x, bn=True, act="leaky"):
    b = _tt(sd[name + ".0.bias"]) if name + ".0.bias" in sd else None
    x = F.conv2d(x, _tt(sd[name + ".0.weight"]), b, 1, 1)
    if bn:
        x = _bn_t(sd, name + ".1", x)
    if act == "leaky":
        x = F.leaky_relu(x, 0.2)
    elif act == "sigmoid":
        x = torch.sigmoid(x)
    return x


def _t_basicblock(sd, p, x, stride):
    idn = x
    y = F.relu(_bn_t(sd, p + ".bn1",
                     F.conv2d(x, _tt(sd[p + ".conv1.weight"]), None, stride, 1)))
    y = _bn_t(sd, p + ".bn2", F.conv2d(y, _tt(sd[p + ".conv2.weight"]), None, 1, 1))
    if p + ".downsample.0.weight" in sd:
        idn = _bn_t(sd, p + ".downsample.1",
                    F.conv2d(x, _tt(sd[p + ".downsample.0.weight"]), None,
                             stride))
    return F.relu(y + idn)


def torch_nlspn_heads(sd, rgb, dep):
    """Reference NLSPN encoder/decoder heads (nlspnmodel.py:318-353), eval
    mode, up to (pred_init, guidance, confidence) — the propagation itself is
    covered by the deform-conv parity tests."""
    fe1 = torch.cat([_t_cbr(sd, "conv1_rgb", rgb, bn=False),
                     _t_cbr(sd, "conv1_dep", dep, bn=False)], 1)
    x = fe1
    feats = [fe1]
    for stage, stride in zip(("conv2", "conv3", "conv4", "conv5"),
                             (1, 2, 2, 2)):
        x = _t_basicblock(sd, stage + ".0", x, stride)
        x = _t_basicblock(sd, stage + ".1", x, 1)
        feats.append(x)
    fe1, fe2, fe3, fe4, fe5 = feats
    # conv6 is stride 2 (nlspnmodel.py:243)
    fe6 = F.leaky_relu(_bn_t(sd, "conv6.1", F.conv2d(
        fe5, _tt(sd["conv6.0.weight"]), None, 2, 1)), 0.2)

    def dec(name, x):
        y = F.conv_transpose2d(x, _tt(sd[name + ".0.weight"]), None, stride=2,
                               padding=1, output_padding=1)
        return F.leaky_relu(_bn_t(sd, name + ".1", y), 0.2)

    fd5 = dec("dec5", fe6)
    fd4 = dec("dec4", torch.cat([fd5, fe5], 1))
    fd3 = dec("dec3", torch.cat([fd4, fe4], 1))
    fd2 = dec("dec2", torch.cat([fd3, fe3], 1))

    id_fd1 = _t_cbr(sd, "id_dec1", torch.cat([fd2, fe2], 1))
    pred_init = _t_cbr(sd, "id_dec0", torch.cat([id_fd1, fe1], 1), bn=False)
    gd_fd1 = _t_cbr(sd, "gd_dec1", torch.cat([fd2, fe2], 1))
    guide = _t_cbr(sd, "gd_dec0", torch.cat([gd_fd1, fe1], 1), bn=False,
                   act=None)
    cf_fd1 = _t_cbr(sd, "cf_dec1", torch.cat([fd2, fe2], 1))
    conf = _t_cbr(sd, "cf_dec0", torch.cat([cf_fd1, fe1], 1), bn=False,
                  act="sigmoid")
    return pred_init, guide, conf


@pytest.mark.slow
def test_nlspn_conversion_matches_torch_math():
    cfg = Config(
        model_name="NLSPN", network="resnet18", prop_time=2, prop_kernel=3,
        affinity="TGASS", conf_prop=True, patch_height=32, patch_width=48,
    ).finalize()
    model = build_model(cfg)
    rgb = RNG.randn(1, 3, 32, 48).astype(np.float32)
    dep = np.abs(RNG.randn(1, 1, 32, 48)).astype(np.float32)
    sample = {
        "rgb": jnp.asarray(rgb.transpose(0, 2, 3, 1)),
        "dep": jnp.asarray(dep.transpose(0, 2, 3, 1)),
    }
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    sd = _synth_nlspn_sd()
    params, stats = convert_reference_model(sd)  # NLSPN dispatch
    flat_conv = flax.traverse_util.flatten_dict(params, sep="/")
    flat_init = flax.traverse_util.flatten_dict(
        flax.core.unfreeze(variables["params"]), sep="/")
    missing = [k for k in flat_conv if k not in flat_init]
    assert not missing, f"unknown paths: {missing[:5]}"
    assert len(flat_conv) == len(flat_init), (
        f"converter covered {len(flat_conv)} of {len(flat_init)} leaves")

    merged_p = merge_params(flax.core.unfreeze(variables["params"]), params)
    merged_s = merge_params(
        flax.core.unfreeze(variables["batch_stats"]), stats)
    out = model.apply({"params": merged_p, "batch_stats": merged_s},
                      sample, train=False)

    with torch.no_grad():
        ref_init, ref_guide, ref_conf = torch_nlspn_heads(
            sd, _tt(rgb), _tt(dep))

    # synthetic BN stats don't renormalise the compounding activations, so
    # magnitudes reach ~1e6 by the last decoder conv; 1e-3 relative is float32
    # reassociation noise, not a layout error
    np.testing.assert_allclose(
        np.asarray(out["pred_init"]).transpose(0, 3, 1, 2), ref_init.numpy(),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["guidance"]).transpose(0, 3, 1, 2), ref_guide.numpy(),
        rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["confidence"]).transpose(0, 3, 1, 2), ref_conf.numpy(),
        rtol=1e-3, atol=1e-3)
    assert np.isfinite(np.asarray(out["pred"])).all()
