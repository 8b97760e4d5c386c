"""Real-chip window-attention kernel check (run on the TPU, ~15 min).

Two stages:
  1. Per-stage parity of the fused-input (v3/v4) kernel vs the einsum spec
     at every flagship Swin-L stage shape (train + eval grids), masked and
     unmasked, bf16 — catches Mosaic miscompiles interpret tests cannot see.
  2. Small-shape training check: loss + full grad tree of a 2-stage Swin
     with fused_qkv_attention ON vs OFF (custom_vjp backward kernel vs XLA
     autodiff of the einsum path).

Prints QKV_PARITY_OK and V3_TRAIN_OK on success. Do NOT A/B full-model
`pred` with random weights instead of this — 1-2% bf16 feature noise
amplifies chaotically through the 20-step sampler + reciprocal decode
(see CLAUDE.md ledger, r4).

Usage: PYTHONPATH=/root/repo python tools/tpu_window_attention_check.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

from diffusiondepth_tpu.ops.window_attention import (
    window_attention_qkv_pallas,
    window_attention_qkv_reference,
)
from diffusiondepth_tpu.models.backbones.swin import shifted_window_mask

print("backend:", jax.default_backend(), flush=True)

WS = 7
STAGES = [
    ("train-s1", 4, 88, 227, 6, 192),
    ("train-s2", 4, 44, 114, 12, 384),
    ("train-s3", 4, 22, 57, 24, 768),
    ("train-s4", 4, 11, 29, 48, 1536),
    ("eval-s1", 8, 88, 304, 6, 192),
    ("eval-s2", 8, 44, 152, 12, 384),
    ("eval-s3", 8, 22, 76, 24, 768),
    ("eval-s4", 8, 11, 38, 48, 1536),
]

rng = np.random.RandomState(0)
bad = 0
for name, b, gh, gw, heads, c in STAGES:
    hp = -(-gh // WS) * WS
    wp = -(-gw // WS) * WS
    nw = (hp // WS) * (wp // WS)
    n = WS * WS
    d = c // heads
    scale = d ** -0.5
    qkv = jnp.asarray(rng.randn(b, nw, n, 3 * c) * 0.1, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(heads, n, n) * 0.1, jnp.float32)
    mask = jnp.asarray(shifted_window_mask(hp, wp, WS, WS // 2), jnp.float32)
    for mname, m in (("nomask", None), ("mask", mask)):
        ref = np.asarray(jax.jit(
            lambda q, bi: window_attention_qkv_reference(q, bi, m, scale, heads)
        )(qkv, bias), np.float32)
        out = np.asarray(jax.jit(
            lambda q, bi: window_attention_qkv_pallas(q, bi, m, scale, heads)
        )(qkv, bias), np.float32)
        err = np.abs(out - ref)
        denom = max(1e-6, np.abs(ref).max())
        status = "OK" if err.max() / denom < 3e-2 else "FAIL"
        bad += status == "FAIL"
        print(f"{name} {mname}: nw={nw} heads={heads} d={d} "
              f"max={err.max():.4f} rel={err.max()/denom:.4f} {status}",
              flush=True)
print("QKV_PARITY_" + ("FAIL" if bad else "OK"), flush=True)

assert bad == 0


# ---- stage 2: training grads, fused vs einsum ----
from diffusiondepth_tpu.models.backbones.swin import SwinTransformer

import time

B, H, W = 2, 96, 160
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32)


def mk(fused):
    return SwinTransformer(
        embed_dims=96, depths=(2, 2), num_heads=(3, 6), out_indices=(0, 1),
        remat=True, fused_qkv_attention=fused, dtype=None,
    )


m_on, m_off = mk(True), mk(False)
params = m_on.init({"params": jax.random.PRNGKey(0)}, x, train=False)


def loss_fn(model):
    @jax.jit
    def f(params, x):
        outs = model.apply(params, x, train=True,
                           rngs={"dropout": jax.random.PRNGKey(0)})
        return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
    return f


t0 = time.time()
l_on, g_on = jax.value_and_grad(loss_fn(m_on))(params, x)
l_on = float(l_on)
g_on = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), g_on)
print(f"fused train step: loss={l_on:.4f} ({time.time()-t0:.0f}s)", flush=True)

t0 = time.time()
l_off, g_off = jax.value_and_grad(loss_fn(m_off))(params, x)
l_off = float(l_off)
g_off = jax.tree_util.tree_map(lambda a: np.asarray(a, np.float32), g_off)
print(f"einsum train step: loss={l_off:.4f} ({time.time()-t0:.0f}s)", flush=True)

rel_loss = abs(l_on - l_off) / max(1e-6, abs(l_off))
print(f"loss rel diff: {rel_loss:.2e}", flush=True)
assert rel_loss < 2e-3, (l_on, l_off)

flat_on, _ = jax.tree_util.tree_flatten(g_on)
flat_off, treedef = jax.tree_util.tree_flatten(g_off)
worst = 0.0
for a, b in zip(flat_on, flat_off):
    scale = max(1e-6, float(np.abs(b).max()))
    worst = max(worst, float(np.abs(a - b).max()) / scale)
print(f"grad tree: {len(flat_on)} leaves, worst rel-to-max diff {worst:.2e}",
      flush=True)
assert worst < 5e-2, worst  # TPU f32 dots run bf16 passes on the XLA side
print("V3_TRAIN_OK", flush=True)
