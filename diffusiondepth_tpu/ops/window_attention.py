"""Fused window attention (Pallas TPU kernel).

The inner hot kernel of the Swin backbone (SURVEY.md 3.2: WindowMSA
qkv/attn/relpos, reference src/model/backbone/swin.py:150-189). Given
per-window q/k/v, the kernel fuses:

    attn = (q * scale) @ k^T  + relpos_bias [+ shift_mask]
    attn = softmax(attn)           (f32 accumulation)
    out  = attn @ v

into one VMEM-resident pass per block of windows — the (nW, heads, N, N)
attention probabilities never round-trip to HBM (at Swin-L 352x1216 stage 0
that tensor alone is ~1.6 GB/layer in f32; XLA usually fuses it too, but the
Pallas kernel guarantees it and keeps the whole window batch on-chip).

Layout: windows are blocked along the leading (B*nW) axis; each grid step
processes WIN_BLOCK windows x all heads. N (window area, 49 for 7x7) is
zero-padded to a sublane multiple inside the caller; padded key slots are
masked with -inf before the softmax.

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
    """Spec: q/k/v (G, H, N, D); bias (H, N, N); mask (G, N, N) or None."""
    attn = jnp.einsum("ghnd,ghmd->ghnm", q * scale, k)
    attn = attn + bias[None]
    if mask is not None:
        attn = attn + mask[:, None]
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("ghnm,ghmd->ghnd", attn, v)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref, *, scale, n_valid):
    """One block: q/k/v (BW, H, Np, D); bias (H, Np, Np); mask (BW, Np, Np).

    Mosaic supports a single batch dimension on matmuls, so the (BW, H) axes
    are fused for the two dots and un-fused for the bias/mask adds.
    """
    bw, h, n_pad, d = q_ref.shape
    q = (q_ref[:] * scale).reshape(bw * h, n_pad, d)
    k = k_ref[:].reshape(bw * h, n_pad, d)
    v = v_ref[:].reshape(bw * h, n_pad, d)
    attn = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(bw, h, n_pad, n_pad)
    attn = attn + bias_ref[:][None].astype(jnp.float32)
    attn = attn + mask_ref[:][:, None].astype(jnp.float32)

    # mask padded key slots
    col = jax.lax.broadcasted_iota(jnp.int32, attn.shape, dimension=3)
    attn = jnp.where(col < n_valid, attn, -1e30)

    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    out = jax.lax.dot_general(
        attn.reshape(bw * h, n_pad, n_pad), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = out.reshape(bw, h, n_pad, d).astype(o_ref.dtype)


def window_attention_pallas(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    scale: float,
    win_block: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused kernel. q/k/v (G, H, N, D) with G = B * nW; bias (H, N, N);
    mask (nW_phase, N, N) already broadcast/tiled to (G, N, N) by the caller
    (pass zeros when no shift)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    g, h, n, d = q.shape
    n_pad = _round_up(n, 8)
    g_pad = _round_up(g, win_block)

    def pad(x, target_g):
        pads = [(0, target_g - x.shape[0]), (0, 0), (0, n_pad - n), (0, 0)]
        return jnp.pad(x, pads)

    qp, kp, vp = pad(q, g_pad), pad(k, g_pad), pad(v, g_pad)
    bias_p = jnp.pad(bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)))
    if mask is None:
        mask_arr = jnp.zeros((g_pad, n_pad, n_pad), q.dtype)
    else:
        mask_arr = jnp.pad(
            mask, ((0, g_pad - g), (0, n_pad - n), (0, n_pad - n))
        ).astype(q.dtype)

    grid = (g_pad // win_block,)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale, n_valid=n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((win_block, h, n_pad, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_block, h, n_pad, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_block, h, n_pad, d), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, n_pad, n_pad), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_block, n_pad, n_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((win_block, h, n_pad, d), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g_pad, h, n_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp, bias_p, mask_arr)
    return out[:g, :, :n, :]


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
    jnp path (the Pallas kernel is inference-path; training uses the spec —
    XLA's fusion there is already strong and autodiff stays simple)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return window_attention_pallas(q, k, v, bias, mask, scale)
    return window_attention_reference(q, k, v, bias, mask, scale)
