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

Training: ``fused_denoiser`` is a ``jax.custom_vjp`` whose backward is a
hand-written Pallas kernel chain (``fused_denoiser_bwd_chain``): one kernel
per link computing the weight-gradient contractions (accumulated across the
sequential grid into a resident f32 block), the conv bias gradient, the
transposed conv for the input cotangent, the ReLU/GroupNorm-affine masking,
and the (sum t, sum t*xhat) partials for the analytic GroupNorm backward -
verified against an f32-autodiff oracle to be as accurate as autodiff of the
bf16 jnp twin (``_jnp_chain``, kept as the test oracle).
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
    te_ref,
    *outs,
    th: int,
    W: int,
    gn_in: bool,
    relu_in: bool,
    has_add: bool,
    has_te: bool,
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
        if has_te:
            # per-(batch, channel) vector folded into the add: the caller's
            # condition map is loop-invariant inside the sampler scan while
            # the timestep embedding is a vector, so fusing the +te here
            # avoids materializing a full (cond + te) map every step
            vadd = vadd + te_ref[0, 0].astype(jnp.bfloat16)[None, None, :]
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
    te=None,
    bias=None,
    emit_stats: bool = False,
    interpret: bool = False,
):
    """One chain link: y = conv3x3(maybe(relu(gn_affine(x))) + maybe(add+te)) + b.

    x, add: (B, H, Wp, Cin) bf16 padded layout (valid cols [1, W+1));
    w: (3, 3, Cin, Cout); aeff/beff: (B, Cin) f32; bias: (Cout,) or (B, Cout);
    te: (B, Cin) per-batch vector folded into the add (requires add).
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
    has_te = te is not None
    assert not (has_te and not has_add), "te requires add"
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
    if has_te:
        te = te.astype(jnp.float32).reshape(B, 1, cin)

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
        pl.BlockSpec((1, 1, cin), lambda b, t: (b, 0, 0)) if has_te else dummy_vec,
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
        te if has_te else zero,
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
        has_te=has_te,
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
    return (
        aeff.astype(jnp.float32),
        beff.astype(jnp.float32),
        invc.astype(jnp.float32),
        meanc.astype(jnp.float32),
    )


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


def fused_denoiser_apply(
    variables, noisy_latent, cond, te=None, *, interpret=False,
    keep_intermediates=False
):
    """Pallas forward of ScheduledCNNRefine for fuse='upsample_add'.

    variables: the module's ``params`` subtree; noisy_latent: (B, H, W, 16);
    cond: (B, H, W, C) condition map; te: optional (B, C) timestep-embedding
    vector. With te=None, ``cond`` must already hold cond + te broadcast;
    passing them split keeps the full-map sum from ever materializing — the
    +te lands inside the add-link kernel on the VMEM-resident tile, and the
    pad of ``cond`` is loop-invariant inside the sampler scan (XLA hoists it).
    Exact same math as the flax module (models/heads/denoiser.py:90-116).
    With keep_intermediates, also returns the padded pre-norm conv outputs
    and per-GN statistics the backward kernel chain needs.
    """
    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(variables)
    B, H, W, _ = noisy_latent.shape
    Wp = _round_up(W + 2, 16)
    cin16 = noisy_latent.shape[-1]
    bf = jnp.bfloat16

    x = _pad_w(noisy_latent.astype(bf), Wp)
    condp = _pad_w(cond.astype(bf), Wp)

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
    g0 = _gn_affine_from_partials(ps1, *gn_ab(gn0), 4, H * W * (c64 // 4))
    u2, ps2 = lk(
        u1, w_of(ne1), aeff=g0[0], beff=g0[1], relu_in=True,
        bias=b_of(ne1), emit_stats=True,
    )
    c256 = u2.shape[-1]
    g1 = _gn_affine_from_partials(ps2, *gn_ab(gn1), 4, H * W * (c256 // 4))

    # fuse: conv_a(cond + te + relu(gn(u2))), then conv_b
    u3, _ = lk(
        u2, w_of(fa), aeff=g1[0], beff=g1[1], relu_in=True, add=condp,
        te=te, bias=b_of(fa),
    )
    u4, _ = lk(u3, w_of(fb), bias=b_of(fb))

    # pred: conv256->64, GN4+relu, conv64->16, GN4+relu
    u5, ps5 = lk(u4, w_of(pr0), bias=b_of(pr0), emit_stats=True)
    g2 = _gn_affine_from_partials(ps5, *gn_ab(gn2), 4, H * W * (c64 // 4))
    u6, ps6 = lk(
        u5, w_of(pr1), aeff=g2[0], beff=g2[1], relu_in=True,
        bias=b_of(pr1), emit_stats=True,
    )
    g3 = _gn_affine_from_partials(ps6, *gn_ab(gn3), 4, H * W * (cin16 // 4))

    out = jnp.maximum(u6 * g3[0][:, None, None, :].astype(bf)
                      + g3[1][:, None, None, :].astype(bf), bf(0))
    out = out[:, :, 1 : W + 1, :]
    if keep_intermediates:
        inter = {
            "x": x, "condp": condp, "te": te,
            "u1": u1, "u2": u2, "u3": u3, "u4": u4, "u5": u5, "u6": u6,
            "g0": g0, "g1": g1, "g2": g2, "g3": g3,  # (aeff, beff, inv, mean)
        }
        return out, inter
    return out


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
def fused_denoiser(params, noisy_latent, cond, te):
    """Pallas forward / Pallas backward ScheduledCNNRefine application.

    ``cond`` is the (B, h, w, C) condition map and ``te`` the (B, C) timestep
    embedding; the denoiser condition is ``cond + te`` broadcast. They enter
    SEPARATELY so that this op's saved residuals are (cond, te) rather than
    their per-step sum: inside the sampling scan the condition is
    loop-invariant (hoisted once by scan autodiff) and ``te`` is a vector,
    which is what makes the non-remat sampler scan affordable
    (models/heads/ddim_head.py _sample) — a saved per-step sum would stack
    steps x 163 MB at the flagship train shape.

    Measured on v5e at the flagship KITTI latent (4, 176, 453, 256): forward
    8.4 ms vs 16.9 ms for the XLA lowering of the same chain (2.0x). The
    backward is the hand-written kernel chain (``fused_denoiser_bwd_chain``),
    verified to sit as close to an f32-autodiff oracle as autodiff of the
    bf16 jnp twin does (tests/test_fused_denoiser.py).
    """
    interpret = jax.default_backend() != "tpu"
    return fused_denoiser_apply(
        params, noisy_latent, cond, te, interpret=interpret
    )


def _fused_denoiser_fwd(params, noisy_latent, cond, te):
    return fused_denoiser(params, noisy_latent, cond, te), (
        params,
        noisy_latent,
        cond,
        te,
    )


def _fused_denoiser_bwd(res, ct):
    params, noisy_latent, cond, te = res
    interpret = jax.default_backend() != "tpu"
    dparams, dlat, dfeat = fused_denoiser_bwd_chain(
        params, noisy_latent, cond, ct, te=te, interpret=interpret
    )
    # spatial sum as an MXU ones-dot (a jnp.sum-to-f32 over the big bf16 map
    # would materialize the f32 convert; see GroupNorm note in CLAUDE.md)
    b, hh, ww, c = dfeat.shape
    dte = _sum_spatial_f32_local(dfeat.reshape(b, hh * ww, c)).astype(te.dtype)
    return dparams, dlat, dfeat, dte


# defvjp is wired at module end, after fused_denoiser_bwd_chain is defined.


# ---------------------------------------------------------------------------
# backward kernel chain (phase 2): hand-written gradients per link
# ---------------------------------------------------------------------------


def _bwd_link_kernel(
    r_c,
    r_t,
    r_b,
    un_c,
    un_t,
    un_b,
    cnext_ref,
    wt_ref,
    u_ref,
    a_ref,
    cin_ref,
    te_ref,
    *outs,
    th: int,
    W: int,
    gn_next: bool,
    gn_in: bool,
    has_add: bool,
    has_te: bool,
):
    """Backward of one chain link u_out = conv(g(u_in) [+ add]) + bias.

    Consumes the RAW cotangent r of u_out (t-form ``dy_gn * scale`` when a
    GroupNorm consumes u_out, plain du otherwise) plus that GN's combined
    statistics, and emits:
      * the raw cotangent of u_in (t-form when this link applies a GN to its
        input, with the (sum t, sum t*xhat) partials the next combine needs),
      * per-(dr, dc) weight-gradient contractions accumulated across the
        sequential grid into a resident f32 block,
      * the conv-bias gradient, and optionally d(add).
    Mirrors the forward kernel's geometry (halo rows as 1-row side blocks,
    column taps via f32 rotates, masked zero borders).
    """
    t_out = outs[0]
    dw_ref = outs[1]
    db_ref = outs[2]
    k = 3
    ps_ref = None
    if gn_in:
        ps_ref = outs[k]
        k += 1
    da_ref = outs[k] if has_add else None

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    first = jnp.logical_and(pl.program_id(0) == 0, t == 0)
    Wp = r_c.shape[2]
    cout = r_c.shape[3]
    cin = u_ref.shape[3]
    bf = jnp.bfloat16

    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    colmask = jnp.logical_and(col >= 1, col <= W)
    row = jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    rowmask = jnp.logical_and(
        jnp.logical_or(t > 0, row > 0),
        jnp.logical_or(t < n_t - 1, row < th + 1),
    )
    m_all = jnp.logical_and(colmask, rowmask).astype(bf)

    rh = jnp.concatenate([r_t[0], r_c[0], r_b[0]], axis=0) * m_all
    if gn_next:
        un = jnp.concatenate([un_t[0], un_c[0], un_b[0]], axis=0)
        inv = cnext_ref[0, 0].astype(bf)[None, None, :]
        mean = cnext_ref[0, 1].astype(bf)[None, None, :]
        m1 = cnext_ref[0, 2].astype(bf)[None, None, :]
        m2 = cnext_ref[0, 3].astype(bf)[None, None, :]
        xh = (un - mean) * inv
        du = ((rh - m1 - xh * m2) * inv) * m_all
    else:
        du = rh

    # conv bias gradient (center rows)
    dbp = jnp.sum(du[1 : th + 1], axis=(0, 1), dtype=jnp.float32)

    # v = g(u_in) [+ add] on the center rows (for the weight-grad contraction)
    u = u_ref[0]
    if gn_in:
        ain = cin_ref[0, 0].astype(bf)[None, None, :]
        bin_ = cin_ref[0, 1].astype(bf)[None, None, :]
        pre = u * ain + bin_
        v = jnp.maximum(pre, bf(0))
    else:
        v = u
    if has_add:
        v = v + a_ref[0]
        if has_te:
            v = v + te_ref[0, 0].astype(bf)[None, None, :]
    v = v * colmask.astype(bf)
    v2 = v.reshape(th * Wp, cin)

    # column-shifted du variants (f32 rotate - Mosaic has no bf16 rotate)
    du_f = du.astype(jnp.float32)
    duv = (
        pltpu.roll(du_f, Wp - 1, 1).astype(bf),  # dc=0 wants du[., j+1]
        du,
        pltpu.roll(du_f, 1, 1).astype(bf),  # dc=2 wants du[., j-1]
    )

    # dW[dr, dc] = sum_q v[q] (x) du[q + 1 - dr, j + 1 - dc]
    for dr in range(3):
        for dc in range(3):
            dus = duv[dc][2 - dr : 2 - dr + th].reshape(th * Wp, cout)
            p = jax.lax.dot_general(
                v2,
                dus,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            def _init(p=p, dr=dr, dc=dc):
                dw_ref[dr, dc] = p

            def _acc(p=p, dr=dr, dc=dc):
                dw_ref[dr, dc] = dw_ref[dr, dc] + p

            pl.when(first)(_init)
            pl.when(jnp.logical_not(first))(_acc)

    def _db_init():
        db_ref[0] = dbp

    def _db_acc():
        db_ref[0] = db_ref[0] + dbp

    pl.when(first)(_db_init)
    pl.when(jnp.logical_not(first))(_db_acc)

    # dv = conv3x3(du, wt) with wt pre-flipped/transposed by the caller -
    # identical structure to the forward conv (roll the f32 partials)
    acc = jnp.zeros((th, Wp, cin), jnp.float32)
    for b_ in range(3):
        part = jnp.zeros((th * Wp, cin), jnp.float32)
        for a_ in range(3):
            lhs = du[a_ : a_ + th].reshape(th * Wp, cout)
            part = part + jax.lax.dot_general(
                lhs,
                wt_ref[a_, b_],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        part = part.reshape(th, Wp, cin)
        if b_ == 0:
            part = pltpu.roll(part, 1, 1)
        elif b_ == 2:
            part = pltpu.roll(part, Wp - 1, 1)
        acc = acc + part
    dv = acc * colmask.astype(jnp.float32)
    if has_add:
        da_ref[0] = dv.astype(bf)
    if gn_in:
        scale = cin_ref[0, 4].astype(bf)[None, None, :]
        # Mosaic has no bf16 vector compare ("target does not support this
        # comparison"): take the ReLU mask in f32
        relu_mask = pre.astype(jnp.float32) > 0.0
        tl = jnp.where(relu_mask, dv.astype(bf), bf(0)) * scale
        inv_i = cin_ref[0, 2].astype(bf)[None, None, :]
        mean_i = cin_ref[0, 3].astype(bf)[None, None, :]
        xh_in = (u - mean_i) * inv_i
        ps_ref[0, 0, 0] = jnp.sum(tl, axis=(0, 1), dtype=jnp.float32)
        ps_ref[0, 0, 1] = jnp.sum(tl * xh_in, axis=(0, 1), dtype=jnp.float32)
        t_out[0] = tl
    else:
        t_out[0] = dv.astype(bf)


def _bwd_link(
    r,
    w,
    u_in,
    *,
    W: int,
    u_next=None,
    coef_next=None,
    coef_in=None,
    add=None,
    te=None,
    interpret: bool = False,
):
    """Run the backward kernel for one link.

    r: (B, H, Wp, Cout) raw cotangent of this link's output;
    w: the link's FORWARD kernel (3, 3, Cin, Cout) - flipped/transposed here;
    u_in: (B, H, Wp, Cin) the link's pre-activation input;
    u_next + coef_next ((B, 8, Cout) f32 [inv, mean, m1, m2]): present when a
    GroupNorm consumes this link's output; coef_in ((B, 8, Cin) f32
    [aeff, beff, inv, mean, scale]): present when the link applies GN+ReLU to
    its input; add: the condition map (emits d(add)).
    Returns (t_raw_in, dW, dbias, partials|None, d_add|None).
    """
    B, H, Wp, cout = r.shape
    cin = u_in.shape[3]
    # mirror the forward tile rule: the small-channel links are
    # per-program-overhead-bound, so double the tile height when the f32
    # accumulator + dw-resident block stay inside the VMEM budget. The
    # 256x256 links and the add-link (three extra full-width streams plus
    # the d(add) output) keep th=8.
    th = 16 if (cin * cout <= 64 * 256 and add is None and H % 16 == 0) else TH
    assert H % th == 0, H
    T = H // th
    gn_next = u_next is not None
    gn_in = coef_in is not None
    has_add = add is not None
    has_te = te is not None
    assert not (has_te and not has_add), "te requires add"
    if has_te:
        te = te.astype(jnp.float32).reshape(B, 1, cin)
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2)).astype(jnp.bfloat16)

    def c_spec(c):
        return pl.BlockSpec((1, th, Wp, c), lambda b, t: (b, t, 0, 0))

    def rt_spec(c):
        return pl.BlockSpec(
            (1, 1, Wp, c), lambda b, t: (b, jnp.maximum(t * th - 1, 0), 0, 0)
        )

    def rb_spec(c):
        return pl.BlockSpec(
            (1, 1, Wp, c),
            lambda b, t: (b, jnp.minimum(t * th + th, H - 1), 0, 0),
        )

    dummy = pl.BlockSpec((1, 1), lambda b, t: (0, 0))
    zero = jnp.zeros((1, 1), jnp.float32)
    coefspec = lambda c: pl.BlockSpec((1, 8, c), lambda b, t: (b, 0, 0))

    in_specs = [
        c_spec(cout),
        rt_spec(cout),
        rb_spec(cout),
        c_spec(cout) if gn_next else dummy,
        rt_spec(cout) if gn_next else dummy,
        rb_spec(cout) if gn_next else dummy,
        coefspec(cout) if gn_next else dummy,
        pl.BlockSpec((3, 3, cout, cin), lambda b, t: (0, 0, 0, 0)),
        c_spec(cin),
        c_spec(cin) if has_add else dummy,
        coefspec(cin) if gn_in else dummy,
        pl.BlockSpec((1, 1, cin), lambda b, t: (b, 0, 0)) if has_te else dummy,
    ]
    args = [
        r,
        r,
        r,
        u_next if gn_next else zero,
        u_next if gn_next else zero,
        u_next if gn_next else zero,
        coef_next if gn_next else zero,
        wt,
        u_in,
        add if has_add else zero,
        coef_in if gn_in else zero,
        te if has_te else zero,
    ]

    out_shape = [
        jax.ShapeDtypeStruct((B, H, Wp, cin), jnp.bfloat16),
        jax.ShapeDtypeStruct((3, 3, cin, cout), jnp.float32),
        jax.ShapeDtypeStruct((1, cout), jnp.float32),
    ]
    out_specs = [
        c_spec(cin),
        pl.BlockSpec((3, 3, cin, cout), lambda b, t: (0, 0, 0, 0)),
        pl.BlockSpec((1, cout), lambda b, t: (0, 0)),
    ]
    if gn_in:
        out_shape.append(jax.ShapeDtypeStruct((B, T, 2, cin), jnp.float32))
        out_specs.append(pl.BlockSpec((1, 1, 2, cin), lambda b, t: (b, t, 0, 0)))
    if has_add:
        out_shape.append(jax.ShapeDtypeStruct((B, H, Wp, cin), jnp.bfloat16))
        out_specs.append(c_spec(cin))

    kern = functools.partial(
        _bwd_link_kernel,
        th=th,
        W=W,
        gn_next=gn_next,
        gn_in=gn_in,
        has_add=has_add,
        has_te=has_te,
    )
    flops = 3 * 2 * B * H * Wp * 9 * cin * cout
    outs = pl.pallas_call(
        kern,
        grid=(B, T),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=r.size * 2 * 3 + u_in.size * 2,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    t_raw = outs[0]
    dw = outs[1]
    db = outs[2][0]
    k = 3
    ps = None
    if gn_in:
        ps = outs[k]
        k += 1
    da = outs[k] if has_add else None
    return t_raw, dw, db, ps, da


def _sum_spatial_f32_local(x2):
    ones = jnp.ones(x2.shape[:2], jnp.bfloat16)
    return jax.lax.dot_general(
        ones,
        x2,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _gn_bwd_glue(ps, scale, invc, meanc, num_groups, n_group):
    """From (sum t, sum t*xhat) per (batch, channel): the m1/m2 coefficient
    vectors for the upstream kernel's du assembly, and this GN's param grads.
    t = dy_gn * scale, so dscale = sum_b p2 / scale, dbias = sum_b p1 / scale.
    """
    B, c = ps[..., 0, :].shape if ps.ndim == 3 else (ps.shape[0], ps.shape[-1])
    if ps.ndim == 4:  # (B, T, 2, C) from the kernel
        p1 = ps[:, :, 0].sum(1)
        p2 = ps[:, :, 1].sum(1)
    else:  # (B, 2, C) precombined
        p1, p2 = ps[:, 0], ps[:, 1]
    B, c = p1.shape
    cg = c // num_groups
    m1 = jnp.repeat(p1.reshape(B, num_groups, cg).sum(-1) / n_group, cg, -1)
    m2 = jnp.repeat(p2.reshape(B, num_groups, cg).sum(-1) / n_group, cg, -1)
    safe = jnp.where(jnp.abs(scale) < 1e-8, 1.0, scale)
    dscale = (p2.sum(0) / safe).astype(jnp.float32)
    dbias = (p1.sum(0) / safe).astype(jnp.float32)
    coefs = jnp.stack(
        [invc, meanc, m1, m2] + [jnp.zeros_like(m1)] * 4, axis=1
    ).astype(jnp.float32)  # (B, 8, C)
    return coefs, dscale, dbias


def fused_denoiser_bwd_chain(params, noisy_latent, cond, ct, *, te=None,
                             interpret=False):
    """Hand-written backward of the fused chain: recompute the Pallas forward
    (keeping pre-norm maps + GN stats), then run one backward kernel per link
    back up the chain. ``cond``/``te`` as in fused_denoiser_apply (te=None
    means cond already holds the full fused condition). Returns
    (dparams, dlat, dcond) matching jax.vjp of ``_jnp_chain`` up to bf16
    rounding; d(te) is the spatial sum of dcond (the caller derives it)."""
    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(params)
    B, H, W, cin16 = noisy_latent.shape
    Wp = _round_up(W + 2, 16)
    bf = jnp.bfloat16
    out, it = fused_denoiser_apply(
        params, noisy_latent, cond, te, interpret=interpret,
        keep_intermediates=True,
    )
    c64 = it["u1"].shape[-1]
    c256 = it["u2"].shape[-1]
    n16 = H * W * (cin16 // 4)
    n64 = H * W * (c64 // 4)
    n256 = H * W * (c256 // 4)

    def coef_in_of(g, gn_params):
        aeff, beff, invc, meanc = g
        scale = jnp.broadcast_to(
            gn_params["scale"].astype(jnp.float32)[None, :], invc.shape
        )
        return jnp.stack(
            [aeff, beff, invc, meanc, scale] + [jnp.zeros_like(aeff)] * 3,
            axis=1,
        ).astype(jnp.float32)

    # ---- virtual link 7: out = relu(gn3(u6)), in jnp (16 channels) --------
    a6, b6, inv6, mean6 = it["g3"]
    u6 = it["u6"]
    outp = jnp.maximum(
        u6 * a6[:, None, None, :].astype(bf) + b6[:, None, None, :].astype(bf),
        bf(0),
    )
    ctp = _pad_w(ct.astype(bf), Wp)
    scale3 = gn3["scale"].astype(jnp.float32)
    t6 = jnp.where(outp > 0, ctp, bf(0)) * jnp.broadcast_to(
        scale3, (cin16,)
    ).astype(bf)[None, None, None, :]
    xh6 = (u6 - mean6[:, None, None, :].astype(bf)) * inv6[
        :, None, None, :
    ].astype(bf)
    t62 = t6.reshape(B, -1, cin16)
    p6 = jnp.stack(
        [
            _sum_spatial_f32_local(t62),
            _sum_spatial_f32_local(t62 * xh6.reshape(B, -1, cin16)),
        ],
        axis=1,
    )  # (B, 2, 16)
    coefs6, dscale3, dbias3 = _gn_bwd_glue(p6, scale3, inv6, mean6, 4, n16)

    blk = functools.partial(_bwd_link, W=W, interpret=interpret)

    # link 6: u6 = pr1(relu(gn2(u5)))
    t5, dw_pr1, db_pr1, ps5, _ = blk(
        t6, pr1["kernel"], it["u5"],
        u_next=u6, coef_next=coefs6, coef_in=coef_in_of(it["g2"], gn2),
    )
    coefs5, dscale2, dbias2 = _gn_bwd_glue(
        ps5, gn2["scale"].astype(jnp.float32), it["g2"][2], it["g2"][3], 4, n64
    )
    # link 5: u5 = pr0(u4)
    t4, dw_pr0, db_pr0, _, _ = blk(
        t5, pr0["kernel"], it["u4"], u_next=it["u5"], coef_next=coefs5,
    )
    # link 4: u4 = fb(u3)
    t3, dw_fb, db_fb, _, _ = blk(t4, fb["kernel"], it["u3"])
    # link 3: u3 = fa(relu(gn1(u2)) + cond + te)
    t2, dw_fa, db_fa, ps2, dfeat_p = blk(
        t3, fa["kernel"], it["u2"],
        coef_in=coef_in_of(it["g1"], gn1), add=it["condp"], te=it["te"],
    )
    coefs2, dscale1, dbias1 = _gn_bwd_glue(
        ps2, gn1["scale"].astype(jnp.float32), it["g1"][2], it["g1"][3], 4, n256
    )
    # link 2: u2 = ne1(relu(gn0(u1)))
    t1, dw_ne1, db_ne1, ps1, _ = blk(
        t2, ne1["kernel"], it["u1"],
        u_next=it["u2"], coef_next=coefs2, coef_in=coef_in_of(it["g0"], gn0),
    )
    coefs1, dscale0, dbias0 = _gn_bwd_glue(
        ps1, gn0["scale"].astype(jnp.float32), it["g0"][2], it["g0"][3], 4, n64
    )
    # link 1: u1 = ne0(lat)
    t0, dw_ne0, db_ne0, _, _ = blk(
        t1, ne0["kernel"], it["x"], u_next=it["u1"], coef_next=coefs1,
    )

    dlat = t0[:, :, 1 : W + 1, :].astype(noisy_latent.dtype)
    dfeat = dfeat_p[:, :, 1 : W + 1, :].astype(cond.dtype)

    def cgrad(cp, dw, db):
        return {
            "kernel": dw.astype(cp["kernel"].dtype),
            "bias": db.astype(cp["bias"].dtype),
        }

    def ggrad(gp, ds, dbi):
        return {"scale": ds.astype(gp["scale"].dtype),
                "bias": dbi.astype(gp["bias"].dtype)}

    dparams = jax.tree_util.tree_map(jnp.zeros_like, params)
    dparams = dict(dparams)
    dparams["noise_embedding"] = {
        "Conv_0": cgrad(ne0, dw_ne0, db_ne0),
        "Conv_1": cgrad(ne1, dw_ne1, db_ne1),
        "GroupNorm_0": {"GroupNorm_0": ggrad(gn0, dscale0, dbias0)},
        "GroupNorm_1": {"GroupNorm_0": ggrad(gn1, dscale1, dbias1)},
    }
    dparams["pred"] = {
        "Conv_0": cgrad(pr0, dw_pr0, db_pr0),
        "Conv_1": cgrad(pr1, dw_pr1, db_pr1),
        "GroupNorm_0": {"GroupNorm_0": ggrad(gn2, dscale2, dbias2)},
        "GroupNorm_1": {"GroupNorm_0": ggrad(gn3, dscale3, dbias3)},
    }
    dparams["fuse_conv_a"] = cgrad(fa, dw_fa, db_fa)
    dparams["fuse_conv_b"] = cgrad(fb, dw_fb, db_fb)
    return dparams, dlat, dfeat


fused_denoiser.defvjp(_fused_denoiser_fwd, _fused_denoiser_bwd)
