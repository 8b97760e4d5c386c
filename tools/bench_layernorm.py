"""Decision microbench: LayerNorm lowering variants on TPU, bf16.

Variants, timed fwd AND fwd+bwd at Swin-L stage shapes:
  flax   - nn.LayerNorm(dtype=bf16): f32-stat convert + reduce
  gemv   - models/common.py custom_vjp (ones-dot statistics)
  lane   - plain jnp: jnp.mean(bf16, axis=-1, dtype=f32) lane reduction,
           normalize in bf16 (autodiff backward)

Method: k=30 iterations chained in one jitted lax.scan, one scalar fetch
(CLAUDE.md relay-amortization methodology).

Usage: PYTHONPATH=/root/repo python tools/bench_layernorm.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

SHAPES = [
    ("s1", (4, 88 * 227, 192)),
    ("s3", (4, 22 * 57, 768)),
]
K = 30


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    from diffusiondepth_tpu.models.common import _ln_bf16

    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)

    for name, shape in SHAPES:
        c = shape[-1]
        x = jnp.asarray(rng.randn(*shape), jnp.bfloat16)
        scale = jnp.asarray(rng.rand(c).astype(np.float32) + 0.5)
        bias = jnp.asarray(rng.randn(c).astype(np.float32))

        flax_ln = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
        flax_vars = {"params": {"scale": scale, "bias": bias}}

        def f_flax(x):
            return flax_ln.apply(flax_vars, x)

        def f_gemv(x):
            return _ln_bf16(x, scale, bias, 1e-5)

        def f_lane(x):
            mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
            d = x - mean.astype(jnp.bfloat16)
            var = jnp.mean(d * d, axis=-1, keepdims=True, dtype=jnp.float32)
            inv = jax.lax.rsqrt(var + 1e-5).astype(jnp.bfloat16)
            return (d * inv) * scale.astype(jnp.bfloat16) + bias.astype(
                jnp.bfloat16)

        for tag, fn in (("flax", f_flax), ("gemv", f_gemv), ("lane", f_lane)):
            @jax.jit
            def fwd_k(x):
                def body(carry, _):
                    y = fn(carry)
                    return carry + 0 * y.mean().astype(carry.dtype), y.mean()
                return jax.lax.scan(body, x, None, length=K)[1].sum()

            @jax.jit
            def bwd_k(x):
                def loss(xi):
                    return fn(xi).astype(jnp.float32).mean()

                def body(carry, _):
                    g = jax.grad(loss)(carry)
                    return carry + 0 * g.mean().astype(carry.dtype), g.mean()
                return jax.lax.scan(body, x, None, length=K)[1].sum()

            for mode, f in (("fwd", fwd_k), ("fwd+bwd", bwd_k)):
                _ = float(f(x))  # compile
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    _ = float(f(x))
                    best = min(best, time.perf_counter() - t0)
                print(f"{name} {tag:5s} {mode:7s}: "
                      f"{best / K * 1e3:7.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
