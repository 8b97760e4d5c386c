"""Pallas TPU LayerNorm (bf16 activations, f32 statistics).

Why a kernel: under the bf16 policy, every XLA lowering of last-dim
LayerNorm measured on v5e (flax's f32-stat reduce, MXU ones-GEMV stats,
plain f32-accumulating lane reduces) spends ~9x its bandwidth floor in the
Swin-L forward — the stats reduce and the normalize land in different
fusions, so full-size converts/staging round-trip HBM between them
(convert_reduce_fusion was the LARGEST fwd category, 15.0 ms/iter at
352x906 bs4 vs a ~1.7 ms traffic floor; tools/bench_swin_profile.py).
Here each (token-block, C) tile is read once, statistics are computed on
VMEM-resident f32 temporaries, and y is written once: speed-of-light
traffic (one bf16 read + one bf16 write), zero HBM f32.

Backward is flash-style: residuals are just the INPUT x plus the per-token
(mean, inv) f32 vectors (~C-times smaller than the activation) — xhat is
recomputed in VMEM, dscale/dbias accumulate across the sequential grid into
a constant-index output block (TPU grids execute in order).

STATUS: opt-in via models/common.py::LayerNorm, NOT wired into Swin — the
in-situ A/B (r4, tools/bench_swin_profile.py) measured the kernel itself at
the traffic floor (6.6 ms/iter for all ~50 norms, category 'norm') but the
whole forward SLOWER (41.3 vs 38.5 ms/iter with flax LN): the pallas_call
boundary un-fuses the residual adds + window reshapes XLA folds into the
flax lowering's fusions (+25 ms of add_add/reshape/copy/pad). Keep for
architectures where LN neighbors don't fuse. The jnp twin below is the
mathematical spec and the interpret/off-TPU fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_token_block(c: int, streams: int = 2, f32_temps: int = 2,
                      vmem_budget: int = 6 * 1024 * 1024) -> int:
    """Token rows per grid step (power of two, >=128 so the (1, tb)
    stat-vector blocks are lane-aligned): ``streams`` double-buffered bf16
    (tb, C) streams plus ``f32_temps`` f32 VMEM temporaries per element.
    Swin's largest C is 3072 (stage-3 PatchMerging input), which still fits
    tb=128 under the 16 MB scoped-VMEM limit."""
    per_token = c * (streams * 2 * 2 + f32_temps * 4)
    tb = max(1, vmem_budget // per_token)
    return max(128, min(2048, 1 << (tb.bit_length() - 1)))


def _ln_fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, inv_ref, *,
                   eps):
    x = x_ref[...].astype(jnp.float32)  # (tb, C) f32 in VMEM
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True) / c
    d = x - mean
    var = jnp.sum(d * d, axis=-1, keepdims=True) / c
    inv = jax.lax.rsqrt(var + eps)
    y = d * inv * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)
    mean_ref[...] = mean[:, 0][None]
    inv_ref[...] = inv[:, 0][None]


def _ln_bwd_kernel(x_ref, dy_ref, mean_ref, inv_ref, scale_ref, dx_ref,
                   ds_ref, db_ref):
    from jax.experimental import pallas as pl

    @pl.when(pl.program_id(0) == 0)
    def _():
        ds_ref[...] = jnp.zeros(ds_ref.shape, ds_ref.dtype)
        db_ref[...] = jnp.zeros(db_ref.shape, db_ref.dtype)

    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)  # (tb, C) f32
    c = x.shape[-1]
    mean = mean_ref[...][0][:, None]  # (tb, 1)
    inv = inv_ref[...][0][:, None]
    xhat = (x - mean) * inv
    t = dy * scale_ref[...].astype(jnp.float32)
    m1 = jnp.sum(t, axis=-1, keepdims=True) / c
    m2 = jnp.sum(t * xhat, axis=-1, keepdims=True) / c
    dx = (t - m1 - xhat * m2) * inv
    dx_ref[...] = dx.astype(dx_ref.dtype)
    db_ref[...] += jnp.sum(dy, axis=0, keepdims=True)
    ds_ref[...] += jnp.sum(dy * xhat, axis=0, keepdims=True)


def layernorm_fwd_pallas(x2, scale, bias, eps, interpret=False):
    """x2 (M, C) bf16 -> (y (M, C), mean (M,) f32, inv (M,) f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2.shape
    tb = _pick_token_block(c)
    m_pad = _round_up(m, tb)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // tb,)
    x_spec = pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    y, mean, inv = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=grid,
        in_specs=[x_spec, par_spec, par_spec],
        out_specs=(x_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, c), x2.dtype),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        ),
        interpret=interpret,
    )(x2, scale.reshape(1, c), bias.reshape(1, c))
    return y[:m], mean[0, :m], inv[0, :m]


def layernorm_bwd_pallas(x2, dy2, mean, inv, scale, interpret=False):
    """-> (dx (M, C) bf16, dscale (C,) f32, dbias (C,) f32)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, c = x2.shape
    tb = _pick_token_block(c, streams=3, f32_temps=4)
    m_pad = _round_up(m, tb)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
        dy2 = jnp.pad(dy2, ((0, m_pad - m), (0, 0)))
        mean = jnp.pad(mean, (0, m_pad - m))
        inv = jnp.pad(inv, (0, m_pad - m))
    grid = (m_pad // tb,)
    x_spec = pl.BlockSpec((tb, c), lambda i: (i, 0), memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((1, tb), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    dx, ds, db = pl.pallas_call(
        _ln_bwd_kernel,
        grid=grid,
        in_specs=[x_spec, x_spec, vec_spec, vec_spec, par_spec],
        out_specs=(x_spec, par_spec, par_spec),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, c), x2.dtype),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ),
        interpret=interpret,
    )(x2, dy2, mean.reshape(1, m_pad), inv.reshape(1, m_pad),
      scale.reshape(1, c))
    return dx[:m], ds[0], db[0]


def _ln_jnp_fwd(x2, scale, bias, eps):
    """jnp spec (f32 stats, bf16 normalize) — identical math to the kernel."""
    xf = x2.astype(jnp.float32)
    c = x2.shape[-1]
    mean = jnp.sum(xf, axis=-1) / c
    d = xf - mean[:, None]
    var = jnp.sum(d * d, axis=-1) / c
    inv = jax.lax.rsqrt(var + eps)
    y = d * inv[:, None] * scale.astype(jnp.float32) + bias.astype(
        jnp.float32)
    return y.astype(x2.dtype), mean, inv


def _ln_jnp_bwd(x2, dy2, mean, inv, scale):
    xf = x2.astype(jnp.float32)
    dyf = dy2.astype(jnp.float32)
    c = x2.shape[-1]
    xhat = (xf - mean[:, None]) * inv[:, None]
    t = dyf * scale.astype(jnp.float32)
    m1 = jnp.sum(t, axis=-1) / c
    m2 = jnp.sum(t * xhat, axis=-1) / c
    dx = (t - m1[:, None] - xhat * m2[:, None]) * inv[:, None]
    return dx.astype(x2.dtype), jnp.sum(dyf * xhat, 0), jnp.sum(dyf, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm_bf16(x, scale, bias, eps=1e-5):
    """Last-dim LayerNorm, bf16 traffic + f32 stats; Pallas on TPU."""
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    if jax.default_backend() == "tpu":
        y, _, _ = layernorm_fwd_pallas(x2, scale, bias, eps)
    else:
        y, _, _ = _ln_jnp_fwd(x2, scale, bias, eps)
    return y.reshape(x.shape)


def _layernorm_bf16_fwd(x, scale, bias, eps):
    c = x.shape[-1]
    x2 = x.reshape(-1, c)
    if jax.default_backend() == "tpu":
        y, mean, inv = layernorm_fwd_pallas(x2, scale, bias, eps)
    else:
        y, mean, inv = _ln_jnp_fwd(x2, scale, bias, eps)
    return y.reshape(x.shape), (x2, mean, inv, scale)


def _layernorm_bf16_bwd(eps, res, dy):
    x2, mean, inv, scale = res
    dy2 = dy.reshape(x2.shape).astype(x2.dtype)
    if jax.default_backend() == "tpu":
        dx, ds, db = layernorm_bwd_pallas(x2, dy2, mean, inv, scale)
    else:
        dx, ds, db = _ln_jnp_bwd(x2, dy2, mean, inv, scale)
    return (dx.reshape(dy.shape), ds.astype(scale.dtype),
            db.astype(scale.dtype))


layernorm_bf16.defvjp(_layernorm_bf16_fwd, _layernorm_bf16_bwd)
