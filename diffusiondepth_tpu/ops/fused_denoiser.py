"""Fused Pallas kernels for the diffusion denoiser conv chain.

The flagship training/inference hot loop is the 20-step DDIM sampler whose
body is ``ScheduledCNNRefine`` (models/heads/denoiser.py; reference
src/model/head/ddim_depth_estimate_res_swin_addHAHI.py:336-381): six 3x3
convolutions with GroupNorm(4)+ReLU between them on a (B, H/2, W/2, 256)
latent. XLA runs this chain at ~25-30% MXU because every conv round-trips
its activation through HBM and the GroupNorm stats force extra traversals.

The Pallas path fuses each link of the chain into ONE pass over the feature
map:

    y, partial_stats = kernel( gn_affine+relu(x) [+ add] ->conv3x3-> +bias )

i.e. a kernel reads the raw (pre-norm) output of the previous conv, applies
the previous GroupNorm as a per-(batch, channel) affine (statistics are
combined outside, between kernels, from per-tile partial sums the kernels
emit), the ReLU, an optional residual add (the condition map), the 3x3
conv, and the bias - and writes the next raw conv output. Feature maps
live in HBM exactly once per link, in a W-padded layout (zero border
columns) so the conv's zero-padding comes for free.

Kernel geometry: grid (B, H/TH); each program computes TH=8 output rows at
full padded width. The two halo rows are fetched as separate 1-row block
inputs of the same array (edge programs mask them to zero), so halo
overhead is 2/TH instead of the 3x of whole-block overlap. The column
taps are realised with ``pltpu.roll`` along W inside VMEM (wrapped lanes
land in the masked border columns), so each of the nine taps is a
contiguous (TH*Wp, Cin) @ (Cin, Cout) MXU matmul accumulated in f32.

Training: ``fused_denoiser_forward`` is wrapped in ``jax.custom_vjp`` whose
backward differentiates the identical-math jnp reference implementation
(``_jnp_chain``), so autodiff through the sampler scan keeps working; the
Pallas win applies to the forward/eval path.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH = 8  # output rows per program


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# the fused link kernel
# ---------------------------------------------------------------------------


def _link_kernel(
    x_c,
    x_t,
    x_b,
    w_ref,
    aeff_ref,
    beff_ref,
    add_c,
    add_t,
    add_b,
    bias_ref,
    *outs,
    th: int,
    W: int,
    gn_in: bool,
    relu_in: bool,
    has_add: bool,
    has_bias: bool,
    emit_stats: bool,
):
    y_ref = outs[0]
    ps_ref = outs[1] if emit_stats else None
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    Wp = x_c.shape[2]
    cin = x_c.shape[3]
    cout = w_ref.shape[3]

    top = x_t[0]  # (1, Wp, Cin)
    bot = x_b[0]
    vin = jnp.concatenate([top, x_c[0], bot], axis=0)  # (th+2, Wp, Cin)

    if gn_in:
        a = aeff_ref[0, 0].astype(jnp.bfloat16)  # (Cin,)
        b = beff_ref[0, 0].astype(jnp.bfloat16)
        vin = vin * a[None, None, :] + b[None, None, :]
    if relu_in:
        vin = jnp.maximum(vin, jnp.bfloat16(0))

    if has_add:
        vadd = jnp.concatenate([add_t[0], add_c[0], add_b[0]], axis=0)
        vin = vin + vadd

    # zero everything outside the valid image region AFTER the affine: the
    # conv's zero padding applies to the transformed map. Border columns,
    # plus the halo rows when this program touches the image edge.
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    colmask = jnp.logical_and(col >= 1, col <= W).astype(jnp.bfloat16)
    vin = vin * colmask
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    topmask = jnp.logical_or(t > 0, row > 0)
    botmask = jnp.logical_or(t < n_t - 1, row < th + 1)
    vin = vin * jnp.logical_and(topmask, botmask).astype(jnp.bfloat16)

    # Column taps: compute each tap's partial sum at UNSHIFTED positions and
    # rotate the f32 accumulator into place (Mosaic only supports 32-bit
    # rotates; rolling the bf16 input would need one rotate per (dr, dc)
    # anyway). Circular wrap-around lands in the masked border columns.
    acc = jnp.zeros((th, Wp, cout), jnp.float32)
    for dc in range(3):
        part = jnp.zeros((th * Wp, cout), jnp.float32)
        for dr in range(3):
            lhs = vin[dr : dr + th].reshape(th * Wp, cin)
            part = part + jax.lax.dot_general(
                lhs,
                w_ref[dr, dc],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        part = part.reshape(th, Wp, cout)
        # out[j] += w[:, dc] . in[j + dc - 1]  ==  acc += roll(part, 1 - dc)
        if dc == 0:
            part = pltpu.roll(part, 1, 1)
        elif dc == 2:
            part = pltpu.roll(part, Wp - 1, 1)
        acc = acc + part
    if has_bias:
        acc = acc + bias_ref[0, 0].astype(jnp.float32)[None, None, :]
    # the border columns hold roll wrap-around garbage: zero them (also keeps
    # the emitted statistics exact)
    acc = acc * colmask.astype(jnp.float32)

    y_ref[0] = acc.astype(jnp.bfloat16)
    if emit_stats:
        ps_ref[0, 0, 0] = jnp.sum(acc, axis=(0, 1))
        ps_ref[0, 0, 1] = jnp.sum(acc * acc, axis=(0, 1))


def _fused_link(
    x,
    w,
    *,
    W: int,
    aeff=None,
    beff=None,
    relu_in: bool = False,
    add=None,
    bias=None,
    emit_stats: bool = False,
    interpret: bool = False,
):
    """One chain link: y = conv3x3(maybe(relu(gn_affine(x))) + maybe(add)) + b.

    x, add: (B, H, Wp, Cin) bf16 padded layout (valid cols [1, W+1));
    w: (3, 3, Cin, Cout); aeff/beff: (B, Cin) f32; bias: (Cout,) or (B, Cout).
    Returns (y, partial_stats or None); y is (B, H, Wp, Cout) padded layout.
    """
    B, H, Wp, cin = x.shape
    cout = w.shape[3]
    # Small-channel links are per-program-overhead-bound (the matmuls are
    # tiny); double the tile height when the f32 accumulator pair stays
    # comfortably inside the VMEM budget. The big 256x256 links (and the
    # condition-add link's three full-width streams) keep th=8.
    th = 16 if (cin * cout <= 64 * 256 and not (add is not None) and H % 16 == 0) else TH
    assert H % th == 0, H
    T = H // th
    gn_in = aeff is not None
    has_add = add is not None
    has_bias = bias is not None
    if has_bias and bias.ndim == 1:
        bias = jnp.broadcast_to(bias[None, :], (B, cout))
    # per-batch vectors as (B, 1, C): Mosaic requires the block's last two
    # dims be (8k, 128k) or equal to the array dims
    if has_bias:
        bias = bias.reshape(B, 1, cout)
    if gn_in:
        aeff = aeff.reshape(B, 1, cin)
        beff = beff.reshape(B, 1, cin)

    row_spec_t = pl.BlockSpec(
        (1, 1, Wp, cin), lambda b, t: (b, jnp.maximum(t * th - 1, 0), 0, 0)
    )
    row_spec_b = pl.BlockSpec(
        (1, 1, Wp, cin), lambda b, t: (b, jnp.minimum(t * th + th, H - 1), 0, 0)
    )
    center = pl.BlockSpec((1, th, Wp, cin), lambda b, t: (b, t, 0, 0))
    dummy_vec = pl.BlockSpec((1, 1), lambda b, t: (0, 0))

    in_specs = [
        center,
        row_spec_t,
        row_spec_b,
        pl.BlockSpec((3, 3, cin, cout), lambda b, t: (0, 0, 0, 0)),
        pl.BlockSpec((1, 1, cin), lambda b, t: (b, 0, 0)) if gn_in else dummy_vec,
        pl.BlockSpec((1, 1, cin), lambda b, t: (b, 0, 0)) if gn_in else dummy_vec,
        center if has_add else dummy_vec,
        row_spec_t if has_add else dummy_vec,
        row_spec_b if has_add else dummy_vec,
        pl.BlockSpec((1, 1, cout), lambda b, t: (b, 0, 0)) if has_bias else dummy_vec,
    ]
    zero = jnp.zeros((1, 1), jnp.float32)
    args = [
        x,
        x,
        x,
        w,
        aeff if gn_in else zero,
        beff if gn_in else zero,
        add if has_add else zero,
        add if has_add else zero,
        add if has_add else zero,
        bias if has_bias else zero,
    ]

    out_shape = [jax.ShapeDtypeStruct((B, H, Wp, cout), jnp.bfloat16)]
    out_specs = [pl.BlockSpec((1, th, Wp, cout), lambda b, t: (b, t, 0, 0))]
    if emit_stats:
        out_shape.append(jax.ShapeDtypeStruct((B, T, 2, cout), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, 1, 2, cout), lambda b, t: (b, t, 0, 0))
        )

    kern = functools.partial(
        _link_kernel,
        th=th,
        W=W,
        gn_in=gn_in,
        relu_in=relu_in,
        has_add=has_add,
        has_bias=has_bias,
        emit_stats=emit_stats,
    )
    flops = 2 * B * H * Wp * 9 * cin * cout
    out = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * 2 + y_bytes(B, H, Wp, cout) + w.size * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            # the add-link holds three full-width streams plus the f32
            # accumulator pair: past the default 16M scoped limit, well
            # within v5e physical VMEM
            vmem_limit_bytes=48 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    if emit_stats:
        return out[0], out[1]
    return out[0], None


def y_bytes(B, H, Wp, cout):
    return B * H * Wp * cout * 2


# ---------------------------------------------------------------------------
# stats combination (between kernels, tiny)
# ---------------------------------------------------------------------------


def _gn_affine_from_partials(ps, scale, bias, num_groups: int, n_valid: int):
    """(B, T, 2, C) partial sums -> per-(batch, channel) affine (aeff, beff).

    gn(x) = (x - mean_g) * inv_g * scale + bias  ==  x * aeff + beff with
    aeff = scale * inv_g, beff = bias - mean_g * scale * inv_g.
    n_valid = H * W * (C/num_groups): zero-padded border columns contribute
    nothing to the sums so the true element count must be supplied.
    """
    B, _, _, c = ps.shape
    cg = c // num_groups
    s = ps[:, :, 0].sum(1).reshape(B, num_groups, cg).sum(-1)  # (B, g)
    q = ps[:, :, 1].sum(1).reshape(B, num_groups, cg).sum(-1)
    mean = s / n_valid
    var = jnp.maximum(q / n_valid - mean * mean, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5)
    meanc = jnp.repeat(mean, cg, axis=-1)  # (B, c)
    invc = jnp.repeat(inv, cg, axis=-1)
    aeff = scale[None, :] * invc
    beff = bias[None, :] - meanc * aeff
    return aeff.astype(jnp.float32), beff.astype(jnp.float32)


# ---------------------------------------------------------------------------
# full chain
# ---------------------------------------------------------------------------


def _pad_w(x, Wp):
    B, H, W, C = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0)))


def _chain_params(variables):
    """Pull the ScheduledCNNRefine param tree into the flat layout used here."""
    p = variables
    ne0, ne1 = p["noise_embedding"]["Conv_0"], p["noise_embedding"]["Conv_1"]
    gn0 = p["noise_embedding"]["GroupNorm_0"]["GroupNorm_0"]
    gn1 = p["noise_embedding"]["GroupNorm_1"]["GroupNorm_0"]
    pr0, pr1 = p["pred"]["Conv_0"], p["pred"]["Conv_1"]
    gn2 = p["pred"]["GroupNorm_0"]["GroupNorm_0"]
    gn3 = p["pred"]["GroupNorm_1"]["GroupNorm_0"]
    fa, fb = p["fuse_conv_a"], p["fuse_conv_b"]
    return ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3


def fused_denoiser_apply(variables, noisy_latent, feat, *, interpret=False):
    """Pallas forward of ScheduledCNNRefine for fuse='upsample_add'.

    variables: the module's ``params`` subtree; noisy_latent: (B, H, W, 16);
    feat: (B, H, W, C) condition + timestep embedding, already fused.
    Exact same math as the flax module (models/heads/denoiser.py:90-116).
    """
    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(variables)
    B, H, W, _ = noisy_latent.shape
    Wp = _round_up(W + 2, 16)
    cin16 = noisy_latent.shape[-1]
    bf = jnp.bfloat16

    x = _pad_w(noisy_latent.astype(bf), Wp)
    featp = _pad_w(feat.astype(bf), Wp)

    def w_of(cp):
        return cp["kernel"].astype(bf)

    def b_of(cp):
        return cp["bias"].astype(jnp.float32)

    def gn_ab(cp):
        return cp["scale"].astype(jnp.float32), cp["bias"].astype(jnp.float32)

    lk = functools.partial(_fused_link, W=W, interpret=interpret)

    # noise embedding: conv16->64, GN4+relu, conv64->256, GN4+relu
    u1, ps1 = lk(x, w_of(ne0), bias=b_of(ne0), emit_stats=True)
    c64 = u1.shape[-1]
    a1, b1 = _gn_affine_from_partials(
        ps1, *gn_ab(gn0), 4, H * W * (c64 // 4)
    )
    u2, ps2 = lk(
        u1, w_of(ne1), aeff=a1, beff=b1, relu_in=True,
        bias=b_of(ne1), emit_stats=True,
    )
    c256 = u2.shape[-1]
    a2, b2 = _gn_affine_from_partials(ps2, *gn_ab(gn1), 4, H * W * (c256 // 4))

    # fuse: conv_a(feat + relu(gn(u2))), then conv_b
    u3, _ = lk(
        u2, w_of(fa), aeff=a2, beff=b2, relu_in=True, add=featp,
        bias=b_of(fa),
    )
    u4, _ = lk(u3, w_of(fb), bias=b_of(fb))

    # pred: conv256->64, GN4+relu, conv64->16, GN4+relu
    u5, ps5 = lk(u4, w_of(pr0), bias=b_of(pr0), emit_stats=True)
    a5, b5 = _gn_affine_from_partials(ps5, *gn_ab(gn2), 4, H * W * (c64 // 4))
    u6, ps6 = lk(
        u5, w_of(pr1), aeff=a5, beff=b5, relu_in=True,
        bias=b_of(pr1), emit_stats=True,
    )
    a6, b6 = _gn_affine_from_partials(ps6, *gn_ab(gn3), 4, H * W * (cin16 // 4))

    out = jnp.maximum(u6 * a6[:, None, None, :].astype(bf)
                      + b6[:, None, None, :].astype(bf), bf(0))
    return out[:, :, 1 : W + 1, :]


# ---------------------------------------------------------------------------
# training integration: custom_vjp with a jnp-twin backward
# ---------------------------------------------------------------------------


def _jnp_chain(params, noisy_latent, feat):
    """Pure-jnp twin of fused_denoiser_apply (same math, same param layout).

    Used as the differentiation target for the custom VJP: the Pallas chain
    carries the forward, autodiff of this twin carries the backward. The GN
    uses the same bf16 custom-vjp GroupNorm as the flax module, so training
    gradients are identical to the unfused path.
    """
    from ..models.common import _gn_bf16  # local import: ops must not import

    # models at module load (layering)

    def conv(x, cp):
        # bf16 in/out like flax nn.Conv under the bf16 policy (the TPU conv
        # still accumulates in f32 internally); no preferred_element_type -
        # its transpose rule rejects mixed-dtype cotangents
        y = jax.lax.conv_general_dilated(
            x,
            cp["kernel"].astype(jnp.bfloat16),
            (1, 1),
            ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + cp["bias"].astype(jnp.bfloat16)[None, None, None, :]

    def gn(x, gp):
        return _gn_bf16(
            x, gp["scale"].astype(jnp.float32), gp["bias"].astype(jnp.float32), 4
        )

    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(params)
    x = noisy_latent.astype(jnp.bfloat16)
    v1 = jnp.maximum(gn(conv(x, ne0), gn0), jnp.bfloat16(0))
    ne = jnp.maximum(gn(conv(v1, ne1), gn1), jnp.bfloat16(0))
    u3 = conv(feat.astype(jnp.bfloat16) + ne, fa)
    u4 = conv(u3, fb)
    v5 = jnp.maximum(gn(conv(u4, pr0), gn2), jnp.bfloat16(0))
    return jnp.maximum(gn(conv(v5, pr1), gn3), jnp.bfloat16(0))


@jax.custom_vjp
def fused_denoiser(params, noisy_latent, feat):
    """Pallas forward / jnp-twin backward ScheduledCNNRefine application.

    Measured on v5e at the flagship KITTI latent (4, 176, 453, 256): 8.4 ms
    vs 16.9 ms for the XLA lowering of the same chain (2.0x). The backward
    differentiates ``_jnp_chain`` - bit-comparable gradients to the unfused
    module (the remat'd sampler scan replays the *Pallas* forward, so
    training also gains the forward-pass speedup).
    """
    return fused_denoiser_apply(params, noisy_latent, feat)


def _fused_denoiser_fwd(params, noisy_latent, feat):
    return fused_denoiser_apply(params, noisy_latent, feat), (
        params,
        noisy_latent,
        feat,
    )


def _fused_denoiser_bwd(res, ct):
    params, noisy_latent, feat = res
    _, vjp = jax.vjp(_jnp_chain, params, noisy_latent, feat)
    return vjp(ct.astype(jnp.bfloat16))


fused_denoiser.defvjp(_fused_denoiser_fwd, _fused_denoiser_bwd)
