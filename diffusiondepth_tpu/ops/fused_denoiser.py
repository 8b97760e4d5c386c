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
    #
    # dr-chunking: a contraction narrower than the 128-wide MXU wastes the
    # array (K=64 runs at 50% utilization — ne1/pr0/pr1 measured ~2x their
    # FLOP floor), so consecutive dr taps are PACKED along the channel dim:
    # lhs = [in[dr] ‖ in[dr+1]], rhs = [w[dr] ; w[dr+1]] — the identical
    # products in one full-width matmul (only the f32 accumulation order
    # changes). cin=256 keeps chunk=1 (already full-width, today's path).
    drc = max(1, min(3, 128 // cin))
    acc = jnp.zeros((th, Wp, cout), jnp.float32)
    for dc in range(3):
        part = jnp.zeros((th * Wp, cout), jnp.float32)
        for dr0 in range(0, 3, drc):
            ndr = min(drc, 3 - dr0)
            if ndr == 1:
                lhs = vin[dr0 : dr0 + th].reshape(th * Wp, cin)
                rhs = w_ref[dr0, dc]
            else:
                lhs = jnp.concatenate(
                    [vin[dr0 + i : dr0 + i + th] for i in range(ndr)], axis=-1
                ).reshape(th * Wp, ndr * cin)
                rhs = jnp.concatenate(
                    [w_ref[dr0 + i, dc] for i in range(ndr)], axis=0
                )
            part = part + jax.lax.dot_general(
                lhs,
                rhs,
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
    # condition-add link's three full-width streams) keep th=8 — A/B'd on
    # the device timeline 2026-08-19: th=16 on them is 3-10% SLOWER at the
    # flagship train shape (worse VMEM residency beats halo amortization).
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


def padded_width(W: int) -> int:
    """Width of the zero-bordered conv layout: one zero column at 0, zeros at
    [W+1, Wp). All chain kernels read/write this layout so the 3x3 conv's
    zero padding comes for free (module docstring)."""
    return _round_up(W + 2, 16)


def _pad_w(x, Wp):
    B, H, W, C = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (1, Wp - W - 1), (0, 0)))


pad_w = _pad_w  # public alias for callers that pre-pad (ddim_head._sample)


def _ensure_padded(x, W: int, Wp: int):
    """Pad x to the (B, H, Wp, C) layout unless the caller already did."""
    if x.shape[2] == W:
        return _pad_w(x, Wp)
    assert x.shape[2] == Wp, (x.shape, W, Wp)
    return x


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
    variables, noisy_latent, cond, te=None, *, W=None, out_padded=False,
    interpret=False, keep_intermediates=False, saved=None
):
    """Pallas forward of ScheduledCNNRefine for fuse='upsample_add'.

    variables: the module's ``params`` subtree; noisy_latent: (B, H, W, 16);
    cond: (B, H, W, C) condition map; te: optional (B, C) timestep-embedding
    vector. With te=None, ``cond`` must already hold cond + te broadcast;
    passing them split keeps the full-map sum from ever materializing — the
    +te lands inside the add-link kernel on the VMEM-resident tile.
    Exact same math as the flax module (models/heads/denoiser.py:90-116).

    Padded-layout callers (the sampling scan) pass ``W`` explicitly and
    supply ``noisy_latent``/``cond`` already in the (B, H, Wp, C) zero-border
    layout (``pad_w``); each input is padded here only if it still has
    logical width W. With ``out_padded`` the result keeps that layout too
    (borders are exactly zero), so the whole 20-step scan runs without any
    per-step pad/slice of the 16-channel latent — a 16-wide minor dim
    lane-pads 8x on TPU, so every materialized (B,H,W,16) intermediate
    costs 8x its logical HBM bytes.

    With keep_intermediates, also returns the padded pre-norm conv outputs
    and per-GN statistics the backward kernel chain needs.

    ``saved``: optional dict of forward intermediates the caller's VJP
    stashed so the backward recompute can skip links — any of ``u4`` (the
    fb-link output; skips fb, ~2.1 of the ~7 ms forward-chain recompute per
    scan step at the flagship shape, for steps x 104 MB of stacked residual
    HBM), ``u5``+``g2`` (skips pr0, ~1.3 ms for 26 MB/step) and
    ``u6``+``g3`` (skips pr1 for 6.5 MB/step; g2/g3 are the (aeff, beff,
    inv, mean) tuples). Saving u3 as well would also skip the fa link but
    its 256-ch stack (2.1 GB over 20 steps) blows the v5e HBM budget at the
    flagship train shape, and u2 likewise.
    """
    saved = saved or {}
    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(variables)
    B, H = noisy_latent.shape[0], noisy_latent.shape[1]
    if W is None:
        W = noisy_latent.shape[2]
    Wp = _round_up(W + 2, 16)
    cin16 = noisy_latent.shape[-1]
    bf = jnp.bfloat16

    x = _ensure_padded(noisy_latent.astype(bf), W, Wp)
    condp = _ensure_padded(cond.astype(bf), W, Wp)

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
    if "u4" in saved:
        u4 = saved["u4"]
    else:
        u4, _ = lk(u3, w_of(fb), bias=b_of(fb))

    # pred: conv256->64, GN4+relu, conv64->16, GN4+relu
    if "u5" in saved:
        u5, g2 = saved["u5"], saved["g2"]
    else:
        u5, ps5 = lk(u4, w_of(pr0), bias=b_of(pr0), emit_stats=True)
        g2 = _gn_affine_from_partials(ps5, *gn_ab(gn2), 4, H * W * (c64 // 4))
    if "u6" in saved:
        u6, g3 = saved["u6"], saved["g3"]
    else:
        u6, ps6 = lk(
            u5, w_of(pr1), aeff=g2[0], beff=g2[1], relu_in=True,
            bias=b_of(pr1), emit_stats=True,
        )
        g3 = _gn_affine_from_partials(ps6, *gn_ab(gn3), 4, H * W * (cin16 // 4))

    out = jnp.maximum(u6 * g3[0][:, None, None, :].astype(bf)
                      + g3[1][:, None, None, :].astype(bf), bf(0))
    if not out_padded:
        out = out[:, :, 1 : W + 1, :]
    else:
        # border columns of u6 are exactly zero (kernel colmask), but the GN
        # affine's beff shifts them: re-zero so the padded layout invariant
        # (zero borders) holds for the next scan step's input
        col = jnp.arange(Wp)[None, None, :, None]
        out = jnp.where((col >= 1) & (col <= W), out, bf(0))
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


# Residual HBM budget for stacking u4 (the fb-link output) across the
# sampling scan: at the flagship KITTI train shape (20 steps x bs4 x
# 176x480x256 bf16 = 3.12 GB) the stack pushed the accum-2 train step past
# the v5e's 15.75 GB HBM (OOM by 0.67 GB, r3 bench log); below the budget
# it buys ~2.1 ms/step of backward recompute. Static per-trace choice —
# eval never materializes residuals, so this only shapes the train step.
U4_STACK_BUDGET_BYTES = int(1.5e9)


def u4_stack_fits(n_steps, b, h, w):
    """True when saving u4 across an ``n_steps``-deep sampling scan stays
    inside ``U4_STACK_BUDGET_BYTES`` (shapes are static at trace time)."""
    return n_steps * b * h * padded_width(w) * 256 * 2 <= U4_STACK_BUDGET_BYTES


# Budget for stacking u5 in its NATIVE padded (B, H, Wp, 64) layout instead
# of the lane-dense (B, H, Wp*64) flat: 64 channels lane-pad 2x in a
# (8,128)-tiled bf16 array, so the padded stack costs 2x the flat one in
# HBM (1.67 vs 0.84 GB at the flagship 20-step bs4 train scan) — but the
# flat save costs a lane-compaction relayout copy EACH WAY per scan step
# plus an H-minor-strided dynamic-update-slice (measured 13.1 ms per bs4
# train step total, r5 trace) while the padded save's dus/ds are
# layout-natural (~4 ms at the same shape). Static per-trace choice like
# save_u4; when the padded stack exceeds the budget the flat layout is the
# fallback — same values either way, so grads are bitwise equal.
U5_PAD_BUDGET_BYTES = int(1.8e9)


def u5_pad_stack_fits(n_steps, b, h, w):
    """True when stacking u5 padded (physical bytes: 64->128 lanes) across
    an ``n_steps``-deep sampling scan stays inside ``U5_PAD_BUDGET_BYTES``."""
    return n_steps * b * h * padded_width(w) * 128 * 2 <= U5_PAD_BUDGET_BYTES


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_denoiser_padded(W, save_u4, save_u5p, params, latp, condp, te):
    """Padded-layout fused denoiser for the sampling scan.

    ``latp`` (B, H, Wp, 16) and ``condp`` (B, H, Wp, C) arrive in the
    zero-border conv layout (``pad_w``; Wp = padded_width(W)) and the
    predicted noise returns in the same layout with exactly-zero borders.

    Keeping the latent padded across the whole scan (ddim_head._sample)
    removes every per-step pad/slice/relayout of the 16-channel latent: a
    16-wide minor dim lane-pads 8x on TPU, so each materialized (B,H,W,16)
    intermediate costs 8x its logical HBM bytes — at the flagship bs4 train
    shape the pad/copy/convert glue was ~5 ms of each 36 ms scan iteration.
    The DDIM update (diffusion/ddim.py step_from_alphas) is purely
    multiplicative in (sample, eps), so zero borders are preserved without
    re-masking between steps. The cond pad is likewise hoisted: it happens
    ONCE outside the scan instead of inside both the forward and the
    backward-recompute of every step (2x ~0.5 ms/step on the device
    timeline), and its vjp (a slice) lands outside the scan too.
    """
    interpret = jax.default_backend() != "tpu"
    return fused_denoiser_apply(
        params, latp, condp, te, W=W, out_padded=True, interpret=interpret
    )


def _fused_denoiser_padded_fwd(W, save_u4, save_u5p, params, latp, condp,
                               te):
    interpret = jax.default_backend() != "tpu"
    out, it = fused_denoiser_apply(
        params, latp, condp, te, W=W, out_padded=True, interpret=interpret,
        keep_intermediates=True,
    )
    # Residual layout choices (these stack steps-deep inside the sampling
    # scan, so every byte and every lane-pad multiplies by 20):
    #  * the latent is saved as the bf16 the kernels consumed, RESHAPED FLAT
    #    (B, H, Wp*16): the 16-wide minor dim would lane-pad the stacked
    #    residual 8x (1.56 GB for 200 MB of data at the flagship train
    #    shape). The reshape is one relayout each way, time-neutral against
    #    the padded stack's own HBM traffic. A 0-sized dtype token restores
    #    the primal latent dtype in the bwd.
    #  * u4 (the fb-link output) and u5 (+ its g2 GN stats, stacked
    #    (B, 4, 64)) are saved so the backward recompute skips the fb and
    #    pr0 links; see fused_denoiser_apply's ``saved``. u5 is saved in
    #    its native PADDED layout when the stack fits u5_pad_stack_fits
    #    (layout-natural dus/ds; the flat fallback lane-compacts to half
    #    the HBM but costs a relayout copy each way — 13.1 vs ~4 ms per
    #    flagship bs4 train step, r5 trace). u6 is NOT worth saving: its
    #    16-channel stack lane-pads 8x (1.66 GB) to skip the cheapest link,
    #    and the sched kernel donates u6's buffer into xpb. The remaining
    #    recompute is ne0/ne1/fa/pr1 (u1..u3 are the 256-ch maps whose
    #    stacks would blow HBM).
    #  * u4 itself is 3.12 GB over the flagship 20-step bs4 train scan —
    #    big enough to OOM the accum-2 step (r3 bench log) — so callers
    #    pass the static ``save_u4`` gate (u4_stack_fits); off, the
    #    backward recomputes the fb link (~2.1 ms/step).
    B, H, Wp, c16 = latp.shape
    lat_flat = latp.astype(jnp.bfloat16).reshape(B, H, Wp * c16)
    dtok = jnp.zeros((0,), latp.dtype)
    c64 = it["u5"].shape[-1]
    # padded (layout-natural dus/ds, 2x HBM) vs flat (lane-dense, but a
    # relayout copy each way + strided dus) — see u5_pad_stack_fits
    u5_save = it["u5"] if save_u5p else it["u5"].reshape(B, H, Wp * c64)
    g2s = jnp.stack(it["g2"], axis=1)
    u4 = it["u4"] if save_u4 else None
    return out, (params, lat_flat, condp, te, u4, u5_save, g2s, dtok)


def _unstack_saved(u4, u5_save, g2s, Wp):
    saved = {
        "u5": (u5_save if u5_save.ndim == 4
               else u5_save.reshape(u5_save.shape[0], u5_save.shape[1], Wp,
                                    u5_save.shape[2] // Wp)),
        "g2": tuple(g2s[:, i] for i in range(4)),
    }
    if u4 is not None:
        saved["u4"] = u4
    return saved


def _fused_denoiser_padded_bwd(W, save_u4, save_u5p, res, ct):
    params, lat_flat, condp, te, u4, u5_save, g2s, dtok = res
    B, H, wpc = lat_flat.shape
    Wp = condp.shape[2]
    latp = lat_flat.reshape(B, H, Wp, wpc // Wp)
    interpret = jax.default_backend() != "tpu"
    dparams, dlat, dfeat = fused_denoiser_bwd_chain(
        params, latp, condp, ct, te=te, W=W, padded_grads=True,
        interpret=interpret, saved=_unstack_saved(u4, u5_save, g2s, Wp),
    )
    # dte: spatial sum as an MXU ones-dot (see _fused_denoiser_bwd); the
    # padded border columns of dfeat are exactly zero so the sum is exact
    b, hh, ww, c = dfeat.shape
    dte = _sum_spatial_f32_local(dfeat.reshape(b, hh * ww, c)).astype(te.dtype)
    return dparams, dlat.astype(dtok.dtype), dfeat, dte


fused_denoiser_padded.defvjp(_fused_denoiser_padded_fwd, _fused_denoiser_padded_bwd)


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
    # 256x256 links and the add-link keep th=8 (device-timeline A/B
    # 2026-08-19: th=16 on them is 4-10% slower, see _fused_link).
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
                             W=None, padded_grads=False, interpret=False,
                             saved=None):
    """Hand-written backward of the fused chain: recompute the Pallas forward
    (keeping pre-norm maps + GN stats), then run one backward kernel per link
    back up the chain. ``cond``/``te`` as in fused_denoiser_apply (te=None
    means cond already holds the full fused condition). Returns
    (dparams, dlat, dcond) matching jax.vjp of ``_jnp_chain`` up to bf16
    rounding; d(te) is the spatial sum of dcond (the caller derives it).

    Padded-layout callers (fused_denoiser_padded) pass W explicitly with
    noisy_latent/cond/ct already in the (B, H, Wp, *) zero-border layout and
    set ``padded_grads`` to get dlat/dcond back in that layout (their border
    columns are exactly zero — the backward kernels mask them)."""
    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(params)
    B, H = noisy_latent.shape[0], noisy_latent.shape[1]
    if W is None:
        W = noisy_latent.shape[2]
    Wp = _round_up(W + 2, 16)
    cin16 = noisy_latent.shape[-1]
    bf = jnp.bfloat16
    out, it = fused_denoiser_apply(
        params, noisy_latent, cond, te, W=W, interpret=interpret,
        keep_intermediates=True, saved=saved,
    )
    n16 = H * W * (cin16 // 4)

    # ---- virtual link 7: out = relu(gn3(u6)), in jnp (16 channels) --------
    a6, b6, inv6, mean6 = it["g3"]
    u6 = it["u6"]
    outp = jnp.maximum(
        u6 * a6[:, None, None, :].astype(bf) + b6[:, None, None, :].astype(bf),
        bf(0),
    )
    ctp = _ensure_padded(ct.astype(bf), W, Wp)
    scale3 = gn3["scale"].astype(jnp.float32)
    # the relu mask uses the recomputed padded forward whose border columns
    # hold relu(beff) != 0; mask them so a padded-layout ct can't leak in
    col = jnp.arange(Wp)[None, None, :, None]
    live = (outp > 0) & (col >= 1) & (col <= W)
    t6 = jnp.where(live, ctp, bf(0)) * jnp.broadcast_to(
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

    return _chain_bwd_links(
        params, it, t6, coefs6, (dscale3, dbias3),
        W=W, interpret=interpret, padded_grads=padded_grads,
        out_dtypes=(noisy_latent.dtype, cond.dtype),
    )


def _chain_bwd_links(params, it, t6, coefs6, dgn3, *, W, interpret,
                     padded_grads, out_dtypes):
    """Backward kernels for links 6..1 given the t-form cotangent of u6.

    ``it``: the forward intermediates dict (fused_denoiser_apply with
    keep_intermediates); ``t6``/``coefs6``: the virtual-link-7 outputs (from
    the jnp vlink7 in fused_denoiser_bwd_chain or the fused sched-backward
    kernel in fused_sampler_step); ``dgn3``: (dscale3, dbias3).
    Returns (dparams, dlat, dcond)."""
    ne0, gn0, ne1, gn1, fa, fb, pr0, gn2, pr1, gn3 = _chain_params(params)
    dscale3, dbias3 = dgn3
    u6 = it["u6"]
    B, H = u6.shape[0], u6.shape[1]
    c64 = it["u1"].shape[-1]
    c256 = it["u2"].shape[-1]
    cin16 = u6.shape[-1]
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

    lat_dtype, cond_dtype = out_dtypes
    if padded_grads:
        dlat = t0.astype(lat_dtype)
        dfeat = dfeat_p.astype(cond_dtype)
    else:
        dlat = t0[:, :, 1 : W + 1, :].astype(lat_dtype)
        dfeat = dfeat_p[:, :, 1 : W + 1, :].astype(cond_dtype)

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


# ---------------------------------------------------------------------------
# fused sampler step: denoiser chain + DDIM update as ONE custom_vjp
# ---------------------------------------------------------------------------
#
# The sampling scan's remaining XLA glue after the padded-layout rework was
# the eps finish (relu(gn3(u6))), the bf16->f32 convert, the DDIM update and
# the next step's f32->bf16 convert — each a separate pass over 8x-lane-
# padded (B, H, Wp, 16) HBM arrays. Folding them into two small Pallas
# kernels (one forward, one backward that also absorbs the jnp virtual-link-7
# of the chain backward) turns ~6 XLA passes per scan step into two.
#
# The DDIM update implemented here is the head's exact configuration
# (epsilon prediction, clip_sample=False, use_clipped_model_output=True,
# eta=0; diffusion/ddim.py step_from_alphas, reference scheduling_ddim.py):
#     eps  = relu(u6 * a3 + b3)            (bf16, then f32)
#     x0   = (x - sb * eps) / sa           sa = sqrt(alpha_t),  sb = sqrt(1-alpha_t)
#     eps2 = (x - sa * x0) / sb
#     xp   = sp * x0 + sq * eps2           sp = sqrt(alpha_prev), sq = sqrt(1-alpha_prev)
# Backward (the update is LINEAR in (x, eps) given the alphas):
#     dx   = dxp * sp / sa                 (the algebraically-exact closed form;
#     deps = dxp * (sq - sp * sb / sa)      autodiff's term-by-term expansion
#                                           cancels catastrophically near t=0)


def _sched_step_kernel(u6_ref, x_ref, coef_ref, scal_ref, xp_ref, xpb_ref,
                       *, W: int):
    bf = jnp.bfloat16
    Wp = u6_ref.shape[2]
    a = coef_ref[0, 0].astype(bf)[None, None, :]
    b = coef_ref[0, 1].astype(bf)[None, None, :]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    colmask = jnp.logical_and(col >= 1, col <= W).astype(bf)
    # same rounding as the XLA path: eps in bf16, then converted to f32
    eps = (jnp.maximum(u6_ref[0] * a + b, bf(0)) * colmask).astype(jnp.float32)
    x = x_ref[0]
    sa = scal_ref[0, 0]
    sb = scal_ref[0, 1]
    sp = scal_ref[0, 2]
    sq = scal_ref[0, 3]
    x0 = (x - sb * eps) / sa
    eps2 = (x - sa * x0) / sb
    xp = sp * x0 + sq * eps2
    xp_ref[0] = xp
    xpb_ref[0] = xp.astype(bf)


def _sched_bwd_kernel(dxp_ref, dxpb_ref, u6_ref, coef_ref, scal_ref,
                      dx_ref, t6_ref, ps_ref, *, W: int):
    bf = jnp.bfloat16
    Wp = u6_ref.shape[2]
    dxp = dxp_ref[0] + dxpb_ref[0].astype(jnp.float32)
    sa = scal_ref[0, 0]
    sb = scal_ref[0, 1]
    sp = scal_ref[0, 2]
    sq = scal_ref[0, 3]
    dx_ref[0] = dxp * (sp / sa)
    deps = dxp * (sq - sp * sb / sa)
    a = coef_ref[0, 0].astype(bf)[None, None, :]
    b = coef_ref[0, 1].astype(bf)[None, None, :]
    pre = u6_ref[0] * a + b
    col = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    colmask = jnp.logical_and(col >= 1, col <= W)
    # Mosaic has no bf16 vector compare: take the relu mask in f32
    live = jnp.logical_and(pre.astype(jnp.float32) > 0.0, colmask)
    scale3 = coef_ref[0, 4].astype(bf)[None, None, :]
    tl = jnp.where(live, deps.astype(bf), bf(0)) * scale3
    inv6 = coef_ref[0, 2].astype(bf)[None, None, :]
    mean6 = coef_ref[0, 3].astype(bf)[None, None, :]
    xh6 = (u6_ref[0] - mean6) * inv6
    # f32 upcast before the sum so accumulation is f32 on every backend.
    # NOTE: with --xla_allow_excess_precision (on by default) the compiler
    # elides the f32->bf16->f32 round-trip through ``tl``, so these stats sum
    # the UNROUNDED products — ~bf16-level (0.3%) different from summing the
    # materialized t6 output. More precise, but not bitwise-consistent with
    # t6; the GN-stat consumers tolerate bf16 noise by construction.
    tl32 = tl.astype(jnp.float32)
    ps_ref[0, 0, 0] = jnp.sum(tl32, axis=(0, 1))
    ps_ref[0, 0, 1] = jnp.sum(tl32 * xh6.astype(jnp.float32), axis=(0, 1))
    t6_ref[0] = tl


def _sched_blocks(B, H, Wp, c16, th):
    c_f = pl.BlockSpec((1, th, Wp, c16), lambda b, t: (b, t, 0, 0))
    coef = pl.BlockSpec((1, 8, c16), lambda b, t: (b, 0, 0))
    scal = pl.BlockSpec((1, 4), lambda b, t: (0, 0))
    return c_f, coef, scal


def _sched_th(H: int, Wp: int, stream_bytes: int) -> int:
    """Tile height for the scheduler kernels, sized to scoped VMEM.

    The 16-channel minor dim lane-pads 8x inside VMEM blocks too, so each
    row of each stream costs Wp*128*dtype bytes — at the flagship train
    shape (Wp=464) a th=16 forward block already blows the 16 MB
    scoped-vmem limit (21.75 MB, compile-time OOM), and at the eval width
    (Wp=624) even th=8 is borderline for the backward's 14 bytes/elem of
    streams. These kernels are pure-VPU bandwidth-bound; tile height does
    not move their time, so shrink until the double-buffered streams fit
    in a 9 MB budget. The budget is NOT the 16 MB scoped limit: the kernel
    stack frame also holds Mosaic's f32 temporaries (eps/x0/eps2 etc.) —
    at the flagship train shape the fwd kernel's frame measured 16.14 MB
    when its streams were 11.4 MB (th=8, compile-time OOM by 140 KB), a
    ~1.4x overhead. th is dim -3 of the block so any value is tile-free
    ((8,128) tiling pads the LAST two dims, (Wp, 16))."""
    def fits(t: int) -> bool:
        return t * Wp * 128 * stream_bytes * 2 <= 9e6

    # largest divisor of H that is <= TH and fits the stream budget (halving
    # alone can strand on a non-divisible half with the budget still blown,
    # e.g. odd H at a wide Wp)
    th = max((t for t in range(1, min(TH, H) + 1) if H % t == 0 and fits(t)),
             default=0)
    if th == 0:
        raise ValueError(
            f"scheduler-kernel streams do not fit scoped VMEM even at th=1: "
            f"H={H} Wp={Wp} stream_bytes={stream_bytes} "
            f"(row cost {Wp * 128 * stream_bytes * 2 / 1e6:.2f} MB > 9 MB)"
        )
    return th


def _sched_step(u6, x, coefs, sched, *, W, interpret):
    """coefs: (B, 8, 16) f32 [a3eff, b3eff, ...]; sched: (4,) f32."""
    B, H, Wp, c16 = u6.shape
    th = _sched_th(H, Wp, 4 + 2 + 4 + 2)  # x, u6 in; xp, xpb out
    c_f, coef, scal = _sched_blocks(B, H, Wp, c16, th)
    xp, xpb = pl.pallas_call(
        functools.partial(_sched_step_kernel, W=W),
        grid=(B, H // th),
        in_specs=[c_f, c_f, coef, scal],
        out_specs=[c_f, c_f],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wp, c16), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Wp, c16), jnp.bfloat16),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * B * H * Wp * c16,
            bytes_accessed=B * H * Wp * c16 * 12,
            transcendentals=0,
        ),
        # donate the dead inputs into the outputs (u6 -> xpb, x -> xp: same
        # shape/dtype, elementwise blocks read before written): without the
        # aliases XLA keeps both latent-pair carries live across the scan
        # body and copies them at the while boundary — two ~0.5 ms copies
        # per sampler step (~20 ms per bs4 train step on the device
        # timeline)
        input_output_aliases={0: 1, 1: 0},
        interpret=interpret,
    )(u6, x.astype(jnp.float32), coefs, sched.reshape(1, 4))
    return xp, xpb


def _sched_bwd(dxp, dxpb, u6, coefs, sched, *, W, interpret):
    B, H, Wp, c16 = u6.shape
    th = _sched_th(H, Wp, 4 + 2 + 2 + 4 + 2)  # dxp, dxpb, u6 in; dx, t6 out
    c_f, coef, scal = _sched_blocks(B, H, Wp, c16, th)
    c_b = pl.BlockSpec((1, th, Wp, c16), lambda b, t: (b, t, 0, 0))
    dx, t6, ps = pl.pallas_call(
        functools.partial(_sched_bwd_kernel, W=W),
        grid=(B, H // th),
        in_specs=[c_f, c_b, c_b, coef, scal],
        out_specs=[
            c_f,
            c_b,
            pl.BlockSpec((1, 1, 2, c16), lambda b, t: (b, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, H, Wp, c16), jnp.float32),
            jax.ShapeDtypeStruct((B, H, Wp, c16), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, H // th, 2, c16), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=16 * B * H * Wp * c16,
            bytes_accessed=B * H * Wp * c16 * 14,
            transcendentals=0,
        ),
        # donate the incoming cotangent pair (dead after this call) into the
        # outputs — see _sched_step: keeps the backward scan's carry updates
        # in place instead of copied at the while boundary
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(dxp, dxpb, u6, coefs, sched.reshape(1, 4))
    return dx, t6, ps


def _coefs7(g3, gn3):
    """(B, 8, 16) f32 [a3eff, b3eff, inv6, mean6, scale3, 0, 0, 0]."""
    a6, b6, inv6, mean6 = g3
    scale = jnp.broadcast_to(
        gn3["scale"].astype(jnp.float32)[None, :], inv6.shape
    )
    return jnp.stack(
        [a6, b6, inv6, mean6, scale] + [jnp.zeros_like(a6)] * 3, axis=1
    ).astype(jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def fused_sampler_step(W, save_u4, save_u5p, params, x_f32, x_bf16, condp, te,
                       sched):
    """One whole DDIM sampler step (denoiser chain + scheduler update) in the
    padded layout: (x_f32, x_bf16) -> (x'_f32, x'_bf16).

    The latent rides the scan as an (f32, bf16) PAIR, both produced by the
    fused scheduler kernel in one pass: the f32 copy carries the trajectory
    precision the DDIM math needs (bf16 underflow near t=0, CLAUDE.md), the
    bf16 copy is what the chain kernels consume — so neither a bf16 convert
    nor any eps/out materialization happens in XLA between steps. ``sched``
    is the per-step (4,) f32 vector [sqrt(a_t), sqrt(1-a_t), sqrt(a_prev),
    sqrt(1-a_prev)] precomputed from the alpha tables outside the scan.
    Only valid for the head's shipped scheduler configuration (epsilon
    prediction, clip_sample=False, use_clipped_model_output=True, eta=0) —
    ddim_head._sample guards and falls back to fused_denoiser_padded + the
    jnp scheduler otherwise.

    VJP residuals: (params, flat bf16 latent, condp, te, u4, sched) — see
    _fused_denoiser_padded_fwd for the layout arguments; the static
    ``save_u4`` gate (u4_stack_fits) drops the 256-ch u4 stack when it
    would blow the HBM budget at the scan depth. The backward fuses
    the scheduler transpose AND the chain's virtual link 7 into one kernel
    (_sched_bwd_kernel), then runs the shared link backward chain.
    """
    interpret = jax.default_backend() != "tpu"
    (xp, xpb), _ = _sampler_step_impl(
        W, params, x_f32, x_bf16, condp, te, sched, interpret
    )
    return xp, xpb


def _sampler_step_impl(W, params, x_f32, x_bf16, condp, te, sched, interpret):
    _, it = fused_denoiser_apply(
        params, x_bf16, condp, te, W=W, out_padded=True, interpret=interpret,
        keep_intermediates=True,
    )
    gn3 = _chain_params(params)[9]
    xp, xpb = _sched_step(
        it["u6"], x_f32, _coefs7(it["g3"], gn3), sched,
        W=W, interpret=interpret,
    )
    return (xp, xpb), it


def _fused_sampler_step_fwd(W, save_u4, save_u5p, params, x_f32, x_bf16,
                            condp, te, sched):
    interpret = jax.default_backend() != "tpu"
    (xp, xpb), it = _sampler_step_impl(
        W, params, x_f32, x_bf16, condp, te, sched, interpret
    )
    B, H, Wp, c16 = x_bf16.shape
    lat_flat = x_bf16.reshape(B, H, Wp * c16)
    c64 = it["u5"].shape[-1]
    u5_save = it["u5"] if save_u5p else it["u5"].reshape(B, H, Wp * c64)
    g2s = jnp.stack(it["g2"], axis=1)
    u4 = it["u4"] if save_u4 else None
    return (xp, xpb), (params, lat_flat, condp, te, u4, u5_save, g2s,
                       sched)


def _fused_sampler_step_bwd(W, save_u4, save_u5p, res, cts):
    params, lat_flat, condp, te, u4, u5_save, g2s, sched = res
    dxp, dxpb = cts
    interpret = jax.default_backend() != "tpu"
    B, H, wpc = lat_flat.shape
    Wp = condp.shape[2]
    c16 = wpc // Wp
    latp = lat_flat.reshape(B, H, Wp, c16)

    _, it = fused_denoiser_apply(
        params, latp, condp, te, W=W, out_padded=True, interpret=interpret,
        keep_intermediates=True, saved=_unstack_saved(u4, u5_save, g2s, Wp),
    )
    gn3 = _chain_params(params)[9]
    dx_f32, t6, ps6 = _sched_bwd(
        dxp, dxpb, it["u6"], _coefs7(it["g3"], gn3), sched,
        W=W, interpret=interpret,
    )
    scale3 = gn3["scale"].astype(jnp.float32)
    n16 = H * W * (c16 // 4)
    coefs6, dscale3, dbias3 = _gn_bwd_glue(
        ps6, scale3, it["g3"][2], it["g3"][3], 4, n16
    )
    dparams, dlat_b, dfeat = _chain_bwd_links(
        params, it, t6, coefs6, (dscale3, dbias3),
        W=W, interpret=interpret, padded_grads=True,
        out_dtypes=(jnp.bfloat16, condp.dtype),
    )
    b, hh, ww, c = dfeat.shape
    dte = _sum_spatial_f32_local(dfeat.reshape(b, hh * ww, c)).astype(te.dtype)
    return (dparams, dx_f32, dlat_b, dfeat, dte, jnp.zeros_like(sched))


fused_sampler_step.defvjp(_fused_sampler_step_fwd, _fused_sampler_step_bwd)


# ---------------------------------------------------------------------------
# eval-only grouped-flat sampling path (no 8x lane-padded HBM traffic)
# ---------------------------------------------------------------------------
#
# The padded (B, H, Wp, 16) layout the training path carries lane-pads 8x in
# HBM (a (8,128)-tiled bf16 array with a 16-wide minor dim stores 128 lanes
# per row), so at the bs8 eval shape the scheduler kernel alone moves
# ~1.35 GB per DDIM step and measured 2.05 ms on the device timeline vs a
# ~0.2 ms unpadded floor. Inference needs no residuals, so the eval sampler
# instead rides a GROUPED layout
#
#     (B, H, Wp, 16)  -reshape->  (B, H, G, 128),  G = Wp * 16 // 128
#
# i.e. lane l of group g holds (w = g*8 + l//16, c = l%16) — a pure XLA
# reshape (identical values, no relayout of the logical data) that packs 8
# spatial columns per 128-lane vector and stores the latent UNPADDED. The
# f32 latent rides the scan as a single grouped array (no bf16 pair: the
# chain converts on read), and the DDIM update runs as a grouped elementwise
# Pallas kernel (_flat_ddim_kernel). Mosaic cannot reshape between the
# grouped and spatial layouts inside a kernel (lane<->sublane relayout), so
# the boundary crossings are XLA reshapes whose traffic is part of the win:
# ungroup+bf16-convert feeds the chain (reads 56 MB instead of the padded
# 225 MB it replaces), group() packs the chain's eps back down.
#
# Training keeps the padded (f32, bf16) pair path above unchanged — its
# custom_vjp residual layouts and backward kernels are tuned for it — so
# ddim_head._sample selects this path only when not differentiating
# (train=False; these kernels define no VJP).


def group16(x):
    """(B, H, Wp, C) -> (B, H, Wp*C//128, 128) grouped layout (pure reshape)."""
    B, H, Wp, C = x.shape
    assert (Wp * C) % 128 == 0, (Wp, C)
    return x.reshape(B, H, Wp * C // 128, 128)


def ungroup16(xg, c: int):
    """(B, H, G, 128) -> (B, H, Wp, c) spatial layout (pure reshape)."""
    B, H, G, L = xg.shape
    return xg.reshape(B, H, G * L // c, c)


def _flat_ddim_kernel(eps_ref, x_ref, scal_ref, xp_ref):
    eps = eps_ref[0].astype(jnp.float32)
    x = x_ref[0]
    sa = scal_ref[0, 0]
    sb = scal_ref[0, 1]
    sp = scal_ref[0, 2]
    sq = scal_ref[0, 3]
    # exact step_from_alphas math (epsilon prediction, clip_sample=False,
    # use_clipped_model_output=True, eta=0) — diffusion/ddim.py
    x0 = (x - sb * eps) / sa
    eps2 = (x - sa * x0) / sb
    xp_ref[0] = sp * x0 + sq * eps2


@jax.custom_vjp
def flat_ddim_update(eps_g, x_g, sched):
    """One DDIM update in the grouped layout: x' = update(eps, x).

    eps_g: (B, H, G, 128) bf16 FINISHED noise prediction (relu(gn3(u6)),
    grouped); x_g: (B, H, G, 128) f32 latent; sched: (4,) f32
    [sqrt(a_t), sqrt(1-a_t), sqrt(a_prev), sqrt(1-a_prev)].

    Unlike the padded _sched_step there is no tile-height shrinking: the
    grouped blocks carry no lane padding, so th=8 streams are ~1 MB. The
    zero-border invariant holds without masking (the update is multiplicative
    in (x, eps), both zero in the border lanes).

    Differentiable via the algebraically-exact closed form (the update is
    LINEAR in (eps, x) given the alphas), so the eval-flat sampling path can
    be taken under jax.grad — but training deliberately uses the padded
    whole-step fused_sampler_step instead (better residual layout + fused
    backward kernels); see ddim_head._sample.
    """
    return _flat_ddim_impl(eps_g, x_g, sched)


def _flat_ddim_impl(eps_g, x_g, sched):
    interpret = jax.default_backend() != "tpu"
    B, H, G, L = x_g.shape
    th = TH if H % TH == 0 else 1
    blk = pl.BlockSpec((1, th, G, L), lambda b, t: (b, t, 0, 0))
    scal = pl.BlockSpec((1, 4), lambda b, t: (0, 0))
    return pl.pallas_call(
        _flat_ddim_kernel,
        grid=(B, H // th),
        in_specs=[blk, blk, scal],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((B, H, G, L), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=8 * B * H * G * L,
            bytes_accessed=B * H * G * L * 10,
            transcendentals=0,
        ),
        # x is dead after the update: donate it into x' so the scan carry
        # updates in place instead of being copied at the while boundary
        input_output_aliases={1: 0},
        interpret=interpret,
    )(eps_g, x_g, sched.reshape(1, 4))


def _flat_ddim_fwd(eps_g, x_g, sched):
    # 0-sized dtype token restores the eps cotangent dtype in the bwd
    return _flat_ddim_impl(eps_g, x_g, sched), (sched, jnp.zeros((0,), eps_g.dtype))


def _flat_ddim_bwd(res, dxp):
    # x' = sp*x0 + sq*eps2 with x0 = (x - sb*eps)/sa, eps2 = (x - sa*x0)/sb
    # is linear: dx'/dx = sp/sa (eps2 terms cancel), dx'/deps = sq - sp*sb/sa.
    # Plain jnp: the grouped arrays carry no lane padding, so XLA's
    # elementwise pass runs at bandwidth (no Pallas needed in the backward).
    sched, eps_tok = res
    sa, sb, sp, sq = sched[0], sched[1], sched[2], sched[3]
    dx = dxp * (sp / sa)
    deps = (dxp * (sq - sp * sb / sa)).astype(eps_tok.dtype)
    return deps, dx, jnp.zeros_like(sched)


flat_ddim_update.defvjp(_flat_ddim_fwd, _flat_ddim_bwd)
