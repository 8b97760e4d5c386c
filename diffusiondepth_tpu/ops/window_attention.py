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

STATUS: opt-in, measured SLOWER than XLA at every flagship stage shape
(0.66-0.89x; tools/bench_window_attention.py, table in README). Both
implementations are MXU-latency-bound on the tiny 56x32 per-window matmuls
(~15x off the HBM roofline); XLA schedules that batched regime better than
this kernel's (window-block x head) grid. Kept as the VMEM-guaranteed
fallback for shapes where XLA's fusion breaks, with interpret-mode and
real-hardware parity tests.

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
        win_block = _pick_win_block(h, n_pad)
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


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Dispatch: Pallas on TPU, jnp elsewhere. Gradients flow through the
    jnp path (the Pallas kernel is inference-path; training uses the spec -
    XLA's fusion there is already strong and autodiff stays simple)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return window_attention_pallas(q, k, v, bias, mask, scale)
    return window_attention_reference(q, k, v, bias, mask, scale)
