"""Decision table for the v3 fused-input window-attention kernel.

Compares, at every Swin-L stage shape of the KITTI train (352x906 bs4) and
eval (352x1216 bs8) grids, the device cost of the attention block measured
FROM THE QKV DENSE OUTPUT (B, nW, N, 3C) to the attention output — i.e.
including the (B,nW,N,3,H,D) reshape+copy the XLA einsum path pays (27% of
the Swin forward, r4 profile) and the v3 kernel absorbs.

Method: k iterations chained inside one jitted lax.scan (fixed relay
dispatch cost amortized; CLAUDE.md benchmark methodology), one scalar fetch.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_window_attention_v3.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

# (name, B, grid_h, grid_w, heads, C)
STAGES = [
    ("train-s1", 4, 88, 227, 6, 192),
    ("train-s2", 4, 44, 114, 12, 384),
    ("train-s3", 4, 22, 57, 24, 768),
    ("train-s4", 4, 11, 29, 48, 1536),
    ("eval-s1", 8, 88, 304, 6, 192),
    ("eval-s3", 8, 22, 76, 24, 768),
]
WS = 7
K_ITERS = 30


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from diffusiondepth_tpu.ops.window_attention import (
        window_attention_qkv_pallas,
        window_attention_qkv_reference,
    )
    from diffusiondepth_tpu.models.backbones.swin import shifted_window_mask

    rng = np.random.RandomState(0)
    print(f"backend: {jax.default_backend()}")
    for name, b, gh, gw, heads, c in STAGES:
        hp = -(-gh // WS) * WS
        wp = -(-gw // WS) * WS
        nw = (hp // WS) * (wp // WS)
        n = WS * WS
        d = c // heads
        scale = d ** -0.5
        qkv = jnp.asarray(rng.randn(b, nw, n, 3 * c) * 0.1, jnp.bfloat16)
        bias = jnp.asarray(rng.randn(heads, n, n) * 0.1, jnp.float32)
        mask = jnp.asarray(shifted_window_mask(hp, wp, WS, WS // 2),
                           jnp.float32)

        for mname, m in (("noshift", None), ("shift", mask)):
            def run(fn):
                @jax.jit
                def k_iter(qkv):
                    def body(carry, _):
                        o = fn(carry, bias, m, scale, heads)
                        # feed output back (sliced to qkv shape) to chain deps
                        nxt = jnp.concatenate([o, o, o], axis=-1)
                        return nxt.astype(carry.dtype), ()
                    out, _ = jax.lax.scan(body, qkv, None, length=K_ITERS)
                    return out.astype(jnp.float32).sum()

                v = float(k_iter(qkv))  # compile + sync
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    v = float(k_iter(qkv))
                    best = min(best, time.perf_counter() - t0)
                return best / K_ITERS * 1000, v

            t_ref, v1 = run(window_attention_qkv_reference)
            t_ker, v2 = run(lambda *a: window_attention_qkv_pallas(*a))
            print(f"{name} {mname}: nW={nw} H={heads} C={c}  "
                  f"xla {t_ref:7.3f} ms  v3-kernel {t_ker:7.3f} ms  "
                  f"({t_ref / t_ker:4.2f}x)", flush=True)


if __name__ == "__main__":
    main()
