"""Profile the Swin-L backbone ALONE (fwd and fwd+bwd) on the real TPU.

The r3 train-step breakdown put Swin at ~200 ms of the bs4 micro step with
~27% matmul MFU and ~46 ms of pure data formatting (window partition /
reverse transposes, pad/roll/slice, patch-merging unfold). This tool
isolates the backbone so layout experiments iterate in one backbone compile
(~3 min) instead of a full flagship compile (~10 min).

Prints, from the device timeline (the wall number through the axon relay is
dispatch-dominated):
  * fwd device ms  (eval side: backbone runs once per eval batch)
  * fwd+bwd device ms (train side; remat ON like the flagship)
  * the analyze_trace op/category breakdown for both modules

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_swin_profile.py \
      [--height 352] [--width 906] [--bs 4] [--fwd-only] [--iters 8]
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=352)
    p.add_argument("--width", type=int, default=906)
    p.add_argument("--bs", type=int, default=4)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--fwd-only", action="store_true")
    p.add_argument("--grid-einsum", action="store_true",
                   help="A/B: the zero-transpose 8-D einsum path "
                        "(measured 4.6x slower on v5e)")
    p.add_argument("--no-fused-qkv", action="store_true",
                   help="A/B: disable the v3 fused-input attention kernel")
    p.add_argument("--no-remat", action="store_true")
    p.add_argument("--trace-dir", default="/tmp/swin_profile")
    p.add_argument("--top", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffusiondepth_tpu.models.backbones.swin import (  # noqa: E402
        SwinTransformer,
    )

    model = SwinTransformer(
        embed_dims=192, patch_size=4, window_size=7, mlp_ratio=4,
        depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
        out_indices=(0, 1, 2, 3), remat=not args.no_remat,
        grid_einsum=args.grid_einsum,
        fused_qkv_attention=not args.no_fused_qkv, dtype=jnp.bfloat16,
    )
    print(f"grid_einsum={args.grid_einsum} fused_qkv={not args.no_fused_qkv} "
          f"remat={not args.no_remat}", flush=True)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(args.bs, args.height, args.width, 3),
                    jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x[:1])
    print("params initialized", flush=True)

    k = args.iters

    @jax.jit
    def fwd_k(params, x):
        # amortize the relay's fixed dispatch cost over k chained calls
        def body(carry, _):
            outs = model.apply(params, carry, train=False)
            # feed a scalar of the output back so iterations are serialized
            bump = outs[-1].mean().astype(carry.dtype)
            return carry + bump * 0, sum(o.mean() for o in outs)
        _, vals = jax.lax.scan(body, x, None, length=k)
        return vals.sum()

    @jax.jit
    def trainstep_k(params, x):
        def loss_fn(p, xi):
            outs = model.apply(
                p, xi, train=True,
                rngs={"dropout": jax.random.PRNGKey(0)},
            )
            return sum(o.astype(jnp.float32).mean() for o in outs)

        def body(carry, _):
            g = jax.grad(loss_fn)(params, carry)
            leaf = jax.tree_util.tree_leaves(g)[0]
            bump = leaf.mean().astype(carry.dtype)
            return carry + bump * 0, leaf.mean()
        _, vals = jax.lax.scan(body, x, None, length=k)
        return vals.sum()

    # compile + warm
    t0 = time.perf_counter()
    v = float(fwd_k(params, x))
    print(f"fwd compiled+run in {time.perf_counter()-t0:.1f}s val={v:.4f}",
          flush=True)
    if not args.fwd_only:
        t0 = time.perf_counter()
        v = float(trainstep_k(params, x))
        print(f"fwd+bwd compiled+run in {time.perf_counter()-t0:.1f}s "
              f"val={v:.4f}", flush=True)

    with jax.profiler.trace(args.trace_dir):
        t0 = time.perf_counter()
        v = float(fwd_k(params, x))
        t_fwd = time.perf_counter() - t0
        if not args.fwd_only:
            t0 = time.perf_counter()
            v = float(trainstep_k(params, x))
            t_bwd = time.perf_counter() - t0
    print(f"wall fwd {t_fwd/k*1000:.1f} ms/iter", flush=True)
    if not args.fwd_only:
        print(f"wall fwd+bwd {t_bwd/k*1000:.1f} ms/iter", flush=True)
    print(f"(divide module device totals by k={k})", flush=True)

    from diffusiondepth_tpu.tools.analyze_trace import main as analyze

    analyze([args.trace_dir, "--top", str(args.top)])


if __name__ == "__main__":
    main()
