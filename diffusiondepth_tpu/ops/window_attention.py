"""Fused window attention (Pallas TPU kernel).

The inner hot kernel of the Swin backbone (SURVEY.md 3.2: WindowMSA
qkv/attn/relpos, reference src/model/backbone/swin.py:150-189). Given
per-window q/k/v, the kernel fuses:

    attn = (q * scale) @ k^T  + relpos_bias [+ shift_mask]
    attn = softmax(attn)           (f32 accumulation)
    out  = attn @ v

into one VMEM-resident pass per block of windows - the (nW, heads, N, N)
attention probabilities never round-trip to HBM (at Swin-L 352x1216 stage 0
that tensor alone is ~1.6 GB/layer in f32).

Calling convention (v2): q/k/v keep their natural (B, nW, H, N, D) layout and
the shift mask stays the tiny per-phase (nW, N, N) trace-time constant - the
kernel indexes it by window-block via the grid, so nothing is ever tiled to
(B*nW, N, N) in HBM (the v1 convention materialised ~90 MB of mask per
shifted Swin-L layer). Non-shifted layers compile a mask-free kernel variant.

STATUS: this file holds TWO kernel generations.
- v2 (window_attention_pallas, split q/k/v layout): OPT-IN, measured SLOWER
  than XLA at every flagship stage shape (0.66-0.89x;
  tools/bench_window_attention.py, table in README). Kept as the
  VMEM-guaranteed fallback, with interpret-mode and real-hardware parity
  tests.
- v3/v4 (window_attention_qkv_pallas / window_attention_qkv_train, fused
  qkv-Dense-output layout, heads batched head_chunk at a time): DEFAULT ON
  on TPU — measured 1.37-1.42x the XLA composition at the train stage
  shapes and 1.57-1.66x at the eval shapes
  (tools/bench_window_attention_v3.py); the training twin is a custom_vjp
  whose backward recomputes attention probabilities flash-style in VMEM
  (residual = qkv only).

Grid: (B, nW/win_block); blocks never straddle images, so the mask block
index is just the window-block index. N (window area, 49 for 7x7) is
zero-padded to a sublane multiple; padded key slots get -inf before softmax.
``win_block`` is auto-sized to keep the f32 attention tile within a VMEM
budget across head counts (Swin-L stages have 6..48 heads).

Falls back to the identical jnp composition off-TPU (used for interpret-mode
parity tests and as the mathematical specification).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def window_attention_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
) -> jnp.ndarray:
    """Spec: q/k/v (B, nW, H, N, D); bias (H, N, N); mask (nW, N, N) or None."""
    attn = jnp.einsum("bwhnd,bwhmd->bwhnm", q * scale, k)
    attn = attn + bias[None, None]
    if mask is not None:
        attn = attn + mask[None, :, None]
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bwhnm,bwhmd->bwhnd", attn, v)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _attn_core(q, k, v, bias, mask, *, scale, n_valid, out_dtype):
    """Shared math on one block: q/k/v (BW, H, Np, D); bias (H, Np, Np);
    mask (BW, Np, Np) or None. Mosaic supports a single batch dimension on
    matmuls, so the (BW, H) axes are fused for the two dots and un-fused for
    the bias/mask adds."""
    bw, h, n_pad, d = q.shape
    qf = (q * scale).reshape(bw * h, n_pad, d)
    kf = k.reshape(bw * h, n_pad, d)
    vf = v.reshape(bw * h, n_pad, d)
    attn = jax.lax.dot_general(
        qf, kf,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bw, h, n_pad, n_pad)
    attn = attn + bias[None].astype(jnp.float32)
    if mask is not None:
        attn = attn + mask[:, None].astype(jnp.float32)

    # mask padded key slots
    col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, dimension=3)
    attn = jnp.where(col < n_valid, attn, -1e30)

    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        attn.reshape(bw * h, n_pad, n_pad), vf,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(bw, h, n_pad, d).astype(out_dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *,
                   scale, n_valid):
    o_ref[:] = _attn_core(
        q_ref[0], k_ref[0], v_ref[0], bias_ref[:], mask_ref[:],
        scale=scale, n_valid=n_valid, out_dtype=o_ref.dtype,
    )[None]


def _kernel_nomask(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, n_valid):
    o_ref[:] = _attn_core(
        q_ref[0], k_ref[0], v_ref[0], bias_ref[:], None,
        scale=scale, n_valid=n_valid, out_dtype=o_ref.dtype,
    )[None]


def _pick_win_block(num_heads: int, n_pad: int, d: int = 32, itemsize: int = 2,
                    vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest power-of-two window block whose whole per-block footprint fits
    the budget: double-buffered q/k/v/out I/O blocks + the f32 attention tile
    + its softmax scratch (Mosaic's scoped-vmem limit is 16 MB; stage-0
    Swin-L at block 32 hits 21 MB, hence the explicit estimate)."""
    def footprint(bw):
        io = 4 * bw * num_heads * n_pad * d * itemsize * 2  # q,k,v,out x2 buf
        attn = bw * num_heads * n_pad * n_pad * 4 * 2       # logits + softmax
        mask = bw * n_pad * n_pad * itemsize * 2
        return io + attn + mask

    # Mosaic's scoped-vmem accounting lands at ~2x this estimate (measured:
    # stage-0 block 32 estimates 10.7 MB, compiler reports 21 MB against its
    # 16 MB limit), so the default budget is half the hardware limit.
    p = 2
    while p * 2 <= 64 and footprint(p * 2) <= vmem_budget:
        p *= 2
    return p


def window_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    win_block: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused kernel. q/k/v (B, nW, H, N, D); bias (H, N, N);
    mask (nW, N, N) per-phase constant or None (no shift)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nw, h, n, d = q.shape
    n_pad = _round_up(n, 8)
    if win_block is None:
        win_block = _pick_win_block(h, n_pad, itemsize=q.dtype.itemsize)
    nw_pad = _round_up(nw, win_block)

    def pad(x):
        pads = [(0, 0), (0, nw_pad - nw), (0, 0), (0, n_pad - n), (0, 0)]
        return jnp.pad(x, pads)

    qp, kp, vp = pad(q), pad(k), pad(v)
    bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))

    grid = (b, nw_pad // win_block)
    qkv_spec = pl.BlockSpec((1, win_block, h, n_pad, d),
                            lambda ib, iw: (ib, iw, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((h, n_pad, n_pad), lambda ib, iw: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, win_block, h, n_pad, d),
                            lambda ib, iw: (ib, iw, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, nw_pad, h, n_pad, d), q.dtype)

    if mask is not None:
        mask_p = jnp.pad(
            jnp.asarray(mask),
            ((0, nw_pad - nw), (0, n_pad - n), (0, n_pad - n)),
        ).astype(q.dtype)
        mask_spec = pl.BlockSpec((win_block, n_pad, n_pad),
                                 lambda ib, iw: (iw, 0, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel_masked, scale=scale, n_valid=n),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qp, kp, vp, bias_p, mask_p)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_nomask, scale=scale, n_valid=n),
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(qp, kp, vp, bias_p)
    return out[:, :nw, :, :n, :]


def window_attention_qkv_reference(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    num_heads: int,
) -> jnp.ndarray:
    """Spec for the v3 fused-input kernel: qkv (B, nW, N, 3C) exactly as the
    qkv Dense produces it (channel order [q|k|v] x [head] x [d]); returns
    (B, nW, N, C). Mathematically identical to the WindowMSA jnp path."""
    b, nw, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads
    q6 = qkv.reshape(b, nw, n, 3, num_heads, d)
    q, k, v = q6[..., 0, :, :], q6[..., 1, :, :], q6[..., 2, :, :]
    attn = jnp.einsum("bwqhd,bwkhd->bwhqk", q * scale, k)
    attn = attn + bias[None, None].astype(attn.dtype)
    if mask is not None:
        attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(qkv.dtype)
    return jnp.einsum("bwhqk,bwkhd->bwqhd", attn, v).reshape(b, nw, n, c)


def _qkv_core(qkv, bias_ref, mask, o_ref, *, scale, num_heads, n_valid,
              head_chunk):
    """One (batch, window-tile) block: qkv (T, N, 3C) in the Dense output
    layout — per-head lane slices replace the (B,nW,N,3,H,D) reshape+copy
    that costs 27% of the XLA Swin forward (r4 profile,
    tools/bench_swin_profile.py: the einsum path relayouts q/k/v to
    N-on-lanes in HBM; here the relayout happens on VMEM-resident slices).
    All of QK^T + bias/mask + f32 softmax + AV stay in VMEM: the (..., N, N)
    attention tensor never touches HBM.

    Heads are processed ``head_chunk`` at a time as ONE (hc*T)-batched dot
    pair + ONE 4-D softmax (bias/mask added by broadcast on the
    (hc, T, N, N) view): a per-head Python loop emits 2H tiny dots and H
    softmaxes per program, and those op instances — not FLOPs or bandwidth
    — dominated the kernel (measured ~200x off the FLOP floor per layer)."""
    t, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads

    # padded key columns (n_valid..n) get -inf before the softmax; skipped
    # when n is unpadded (the common case — block dims use n exactly), so
    # the iota+where cost nothing then (ADVICE r4)
    if n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, t, n, n), dimension=3)
        colmask = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
        if mask is not None:
            colmask = colmask + mask.astype(jnp.float32)[None]
    elif mask is not None:
        colmask = mask.astype(jnp.float32)[None]
    else:
        colmask = None

    for h0 in range(0, num_heads, head_chunk):
        hs = list(range(h0, min(h0 + head_chunk, num_heads)))
        hc = len(hs)
        q = jnp.stack([qkv[:, :, h * d:(h + 1) * d] for h in hs])
        k = jnp.stack([qkv[:, :, c + h * d:c + (h + 1) * d] for h in hs])
        v = jnp.stack([qkv[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
                       for h in hs])
        q = q.reshape(hc * t, n, d)
        k = k.reshape(hc * t, n, d)
        v = v.reshape(hc * t, n, d)
        attn = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, n)
        attn = attn + bias_ref[h0:h0 + hc].astype(jnp.float32)[:, None]
        if colmask is not None:
            attn = attn + colmask
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        attn = attn / jnp.sum(attn, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            attn.reshape(hc * t, n, n).astype(v.dtype), v,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, d)
        for i, h in enumerate(hs):
            o_ref[0, :, :, h * d:(h + 1) * d] = out[i].astype(o_ref.dtype)


def _qkv_kernel_masked(qkv_ref, bias_ref, mask_ref, o_ref, *, scale,
                       num_heads, n_valid, head_chunk):
    _qkv_core(qkv_ref[0], bias_ref, mask_ref[...], o_ref, scale=scale,
              num_heads=num_heads, n_valid=n_valid, head_chunk=head_chunk)


def _qkv_kernel_nomask(qkv_ref, bias_ref, o_ref, *, scale, num_heads,
                       n_valid, head_chunk):
    _qkv_core(qkv_ref[0], bias_ref, None, o_ref, scale=scale,
              num_heads=num_heads, n_valid=n_valid, head_chunk=head_chunk)


def _pick_qkv_tile(nw: int, n: int, c: int, num_heads: int,
                   itemsize: int = 2,
                   vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest window tile whose streams + f32 logits fit the budget
    (9 MB-style scoped-vmem rule from the fused-denoiser work: Mosaic's
    f32 temporaries roughly double the raw stream estimate)."""
    n_pad = _round_up(n, 8)

    def footprint(t):
        io = (3 + 1) * t * n_pad * c * itemsize * 2   # qkv + out, double-buf
        logits = 2 * t * n_pad * _round_up(n, 128) * 4  # attn + softmax tmp
        bias = num_heads * n_pad * _round_up(n, 128) * 4
        mask = t * n_pad * _round_up(n, 128) * 4 * 2
        return io + logits + bias + mask

    t = 1
    while t * 2 <= min(64, nw) and footprint(t * 2) <= vmem_budget:
        t *= 2
    return t


def _pick_head_chunk(num_heads: int, t: int, n: int, d: int,
                     n_temps_f32: int = 2, n_temps_bf16: int = 6,
                     itemsize: int = 2,
                     vmem_budget: int = 4 * 1024 * 1024) -> int:
    """Heads batched per chunk in the kernel body. Each (head, window) unit
    stages ~``n_temps_bf16`` lane-padded (n_sub, 128) compute-dtype tiles
    (q/k/v stacks, probs, out; ``itemsize`` bytes each) and ~``n_temps_f32``
    (n_sub, n_lane) f32 logit tiles; chunk heads so those temporaries stay
    within the scoped-VMEM slack left by the streams."""
    n_sub = _round_up(n, 8)
    n_lane = _round_up(n, 128)
    d_lane = _round_up(d, 128)
    unit = (n_temps_bf16 * n_sub * d_lane * itemsize
            + n_temps_f32 * n_sub * n_lane * 4)
    hc = max(1, min(num_heads, vmem_budget // max(1, unit * t)))
    return hc


def window_attention_qkv_pallas(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    num_heads: int,
    win_tile: Optional[int] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """v3 fused kernel. qkv (B, nW, N, 3C) straight from the Dense;
    bias (H, N, N) f32; mask (nW, N, N) per-phase constant or None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nw, n, c3 = qkv.shape
    c = c3 // 3
    isz = qkv.dtype.itemsize  # f32 configs double the VMEM footprint (ADVICE)
    if win_tile is None:
        win_tile = _pick_qkv_tile(nw, n, c, num_heads, itemsize=isz)
    head_chunk = _pick_head_chunk(num_heads, win_tile, n, c // num_heads,
                                  itemsize=isz)
    nw_pad = _round_up(nw, win_tile)
    if nw_pad != nw:
        qkv = jnp.pad(qkv, ((0, 0), (0, nw_pad - nw), (0, 0), (0, 0)))

    grid = (b, nw_pad // win_tile)
    qkv_spec = pl.BlockSpec((1, win_tile, n, c3), lambda ib, iw: (ib, iw, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda ib, iw: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, win_tile, n, c), lambda ib, iw: (ib, iw, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, nw_pad, n, c), qkv.dtype)
    bias_f = jnp.asarray(bias, jnp.float32)

    if mask is not None:
        mask_p = jnp.asarray(mask, jnp.float32)
        if nw_pad != nw:
            mask_p = jnp.pad(mask_p, ((0, nw_pad - nw), (0, 0), (0, 0)))
        mask_spec = pl.BlockSpec((win_tile, n, n), lambda ib, iw: (iw, 0, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_qkv_kernel_masked, scale=scale,
                              num_heads=num_heads, n_valid=n,
                              head_chunk=head_chunk),
            grid=grid,
            in_specs=[qkv_spec, bias_spec, mask_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(qkv, bias_f, mask_p)
    else:
        out = pl.pallas_call(
            functools.partial(_qkv_kernel_nomask, scale=scale,
                              num_heads=num_heads, n_valid=n,
                              head_chunk=head_chunk),
            grid=grid,
            in_specs=[qkv_spec, bias_spec],
            out_specs=out_spec, out_shape=out_shape, interpret=interpret,
        )(qkv, bias_f)
    return out[:, :nw]


def _qkv_bwd_core(qkv, bias_ref, mask, do, dqkv_ref, db_ref, *, scale,
                  num_heads, n_valid, first_block, head_chunk):
    """Backward of one (batch, window-tile) block: recomputes the f32
    attention probabilities in VMEM (flash-style — nothing from the forward
    is read back from HBM except qkv itself), then the four chain dots.
    dbias accumulates across the sequential grid into the (H, N, N) output
    block (constant index_map; TPU grids execute in order). Heads batch
    ``head_chunk`` at a time (see _qkv_core)."""
    from jax.experimental import pallas as pl

    t, n, c3 = qkv.shape
    c = c3 // 3
    d = c // num_heads

    if n_valid < n:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, t, n, n), dimension=3)
        colmask = jnp.where(col < n_valid, 0.0, -1e30).astype(jnp.float32)
        if mask is not None:
            colmask = colmask + mask.astype(jnp.float32)[None]
    elif mask is not None:
        colmask = mask.astype(jnp.float32)[None]
    else:
        colmask = None

    if first_block is not None:
        @pl.when(first_block)
        def _():
            db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    for h0 in range(0, num_heads, head_chunk):
        hs = list(range(h0, min(h0 + head_chunk, num_heads)))
        hc = len(hs)
        q = jnp.stack([qkv[:, :, h * d:(h + 1) * d] for h in hs])
        k = jnp.stack([qkv[:, :, c + h * d:c + (h + 1) * d] for h in hs])
        v = jnp.stack([qkv[:, :, 2 * c + h * d:2 * c + (h + 1) * d]
                       for h in hs])
        doh = jnp.stack([do[:, :, h * d:(h + 1) * d] for h in hs])
        q = q.reshape(hc * t, n, d)
        k = k.reshape(hc * t, n, d)
        v = v.reshape(hc * t, n, d)
        doh = doh.reshape(hc * t, n, d)

        attn = jax.lax.dot_general(
            q * jnp.asarray(scale, q.dtype), k,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, n)
        attn = attn + bias_ref[h0:h0 + hc].astype(jnp.float32)[:, None]
        if colmask is not None:
            attn = attn + colmask
        attn = attn - jnp.max(attn, axis=-1, keepdims=True)
        attn = jnp.exp(attn)
        p = attn / jnp.sum(attn, axis=-1, keepdims=True)  # (hc,T,Nq,Nk) f32
        p_flat = p.reshape(hc * t, n, n)
        p_lo = p_flat.astype(v.dtype)

        # dV[m, d] = sum_q p[q, m] * dO[q, d]
        dv = jax.lax.dot_general(
            p_lo, doh,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, d)
        # dP[q, m] = sum_d dO[q, d] * V[m, d]
        dp = jax.lax.dot_general(
            doh, v,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, n)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))  # f32
        ds_flat = ds.reshape(hc * t, n, n)
        ds_lo = ds_flat.astype(q.dtype)
        dq = jax.lax.dot_general(
            ds_lo, k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, d) * scale
        dk = jax.lax.dot_general(
            ds_lo, q,
            dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).reshape(hc, t, n, d) * scale

        for i, h in enumerate(hs):
            dqkv_ref[0, :, :, h * d:(h + 1) * d] = dq[i].astype(dqkv_ref.dtype)
            dqkv_ref[0, :, :, c + h * d:c + (h + 1) * d] = (
                dk[i].astype(dqkv_ref.dtype))
            dqkv_ref[0, :, :, 2 * c + h * d:2 * c + (h + 1) * d] = (
                dv[i].astype(dqkv_ref.dtype))
        db_ref[h0:h0 + hc] += jnp.sum(ds, axis=1)


def _qkv_bwd_kernel_masked(qkv_ref, bias_ref, mask_ref, do_ref, dqkv_ref,
                           db_ref, *, scale, num_heads, n_valid, head_chunk):
    from jax.experimental import pallas as pl

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    _qkv_bwd_core(qkv_ref[0], bias_ref, mask_ref[...], do_ref[0], dqkv_ref,
                  db_ref, scale=scale, num_heads=num_heads, n_valid=n_valid,
                  first_block=first, head_chunk=head_chunk)


def _qkv_bwd_kernel_nomask(qkv_ref, bias_ref, do_ref, dqkv_ref, db_ref, *,
                           scale, num_heads, n_valid, head_chunk):
    from jax.experimental import pallas as pl

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)
    _qkv_bwd_core(qkv_ref[0], bias_ref, None, do_ref[0], dqkv_ref, db_ref,
                  scale=scale, num_heads=num_heads, n_valid=n_valid,
                  first_block=first, head_chunk=head_chunk)


def _pick_qkv_bwd_tile(nw: int, n: int, c: int, num_heads: int,
                       itemsize: int = 2,
                       vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Like _pick_qkv_tile but for the backward: streams carry qkv + dO +
    dqkv (7C per token) and the per-head VMEM temporaries are ~5 f32
    (T, N, N) tiles (attn/p/dp/ds/sum scratch)."""
    n_lane = _round_up(n, 128)
    n_pad = _round_up(n, 8)

    def footprint(t):
        io = 7 * t * n_pad * c * itemsize * 2          # qkv+do+dqkv, dbl-buf
        logits = 5 * t * n_pad * n_lane * 4            # f32 temporaries
        bias = num_heads * n_pad * n_lane * 4
        mask = t * n_pad * n_lane * 4 * 2
        return io + logits + bias + mask

    t = 1
    while t * 2 <= min(64, nw) and footprint(t * 2) <= vmem_budget:
        t *= 2
    return t


def window_attention_qkv_bwd_pallas(
    qkv: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    dout: jnp.ndarray,
    scale: float,
    num_heads: int,
    win_tile: Optional[int] = None,
    interpret: bool = False,
):
    """Backward kernel: (dqkv (B,nW,N,3C), dbias (H,N,N) f32). Padded
    window tiles contribute nothing (their dout is zero-padded, so every
    chain dot and the dbias row sums vanish)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, nw, n, c3 = qkv.shape
    c = c3 // 3
    isz = qkv.dtype.itemsize  # f32 configs double the VMEM footprint (ADVICE)
    if win_tile is None:
        win_tile = _pick_qkv_bwd_tile(nw, n, c, num_heads, itemsize=isz)
    head_chunk = _pick_head_chunk(num_heads, win_tile, n, c // num_heads,
                                  n_temps_f32=4, n_temps_bf16=10,
                                  itemsize=isz)
    nw_pad = _round_up(nw, win_tile)
    if nw_pad != nw:
        pads = ((0, 0), (0, nw_pad - nw), (0, 0), (0, 0))
        qkv = jnp.pad(qkv, pads)
        dout = jnp.pad(dout, pads)

    grid = (b, nw_pad // win_tile)
    qkv_spec = pl.BlockSpec((1, win_tile, n, c3), lambda ib, iw: (ib, iw, 0, 0),
                            memory_space=pltpu.VMEM)
    do_spec = pl.BlockSpec((1, win_tile, n, c), lambda ib, iw: (ib, iw, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((num_heads, n, n), lambda ib, iw: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((num_heads, n, n), lambda ib, iw: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((b, nw_pad, n, c3), qkv.dtype),
        jax.ShapeDtypeStruct((num_heads, n, n), jnp.float32),
    )
    out_specs = (qkv_spec, db_spec)
    bias_f = jnp.asarray(bias, jnp.float32)

    if mask is not None:
        mask_p = jnp.asarray(mask, jnp.float32)
        if nw_pad != nw:
            mask_p = jnp.pad(mask_p, ((0, nw_pad - nw), (0, 0), (0, 0)))
        mask_spec = pl.BlockSpec((win_tile, n, n), lambda ib, iw: (iw, 0, 0),
                                 memory_space=pltpu.VMEM)
        dqkv, dbias = pl.pallas_call(
            functools.partial(_qkv_bwd_kernel_masked, scale=scale,
                              num_heads=num_heads, n_valid=n,
                              head_chunk=head_chunk),
            grid=grid,
            in_specs=[qkv_spec, bias_spec, mask_spec, do_spec],
            out_specs=out_specs, out_shape=out_shapes, interpret=interpret,
        )(qkv, bias_f, mask_p, dout)
    else:
        dqkv, dbias = pl.pallas_call(
            functools.partial(_qkv_bwd_kernel_nomask, scale=scale,
                              num_heads=num_heads, n_valid=n,
                              head_chunk=head_chunk),
            grid=grid,
            in_specs=[qkv_spec, bias_spec, do_spec],
            out_specs=out_specs, out_shape=out_shapes, interpret=interpret,
        )(qkv, bias_f, dout)
    return dqkv[:, :nw], dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def window_attention_qkv_train(qkv, bias, mask, scale, num_heads,
                               win_tile=None, interpret=False):
    """Differentiable v3 kernel: fwd is window_attention_qkv_pallas, bwd is
    the hand-written flash-style kernel above (residual = just qkv — the
    (..., N, N) probabilities are recomputed in VMEM, never stored). mask is
    a trace-time constant in SwinBlock, so its cotangent is zeros.

    A pinned ``win_tile`` applies to BOTH directions (ADVICE r4); note the
    backward streams ~7C/token (qkv + dout + dqkv) vs the forward's 4C, so
    a tile pinned at the forward's VMEM edge may need halving."""
    return window_attention_qkv_pallas(qkv, bias, mask, scale, num_heads,
                                       win_tile, interpret)


def _qkv_train_fwd(qkv, bias, mask, scale, num_heads, win_tile, interpret):
    out = window_attention_qkv_pallas(qkv, bias, mask, scale, num_heads,
                                      win_tile, interpret)
    return out, (qkv, bias, mask)


def _qkv_train_bwd(scale, num_heads, win_tile, interpret, res, dout):
    qkv, bias, mask = res
    dqkv, dbias = window_attention_qkv_bwd_pallas(
        qkv, bias, mask, dout, scale, num_heads, win_tile=win_tile,
        interpret=interpret,
    )
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, dbias.astype(bias.dtype), dmask


window_attention_qkv_train.defvjp(_qkv_train_fwd, _qkv_train_bwd)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Legacy v2 dispatch (split q/k/v layout): Pallas on TPU, jnp
    elsewhere; gradients flow through the jnp path. This entry point is the
    OPT-IN v2 kernel only — the shipped default is the v3/v4 fused-input
    path (window_attention_qkv_pallas for eval, window_attention_qkv_train
    for training, both consuming the qkv Dense output directly), dispatched
    from WindowMSA (models/backbones/swin.py)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return window_attention_pallas(q, k, v, bias, mask, scale)
    return window_attention_reference(q, k, v, bias, mask, scale)
