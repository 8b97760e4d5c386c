"""Window-attention kernel benchmark: Pallas vs XLA at the flagship shapes.

Measures the fused Pallas kernel (ops/window_attention.py) against the jnp
einsum composition at every Swin-L stage shape of the KITTI 352x1216 eval
config (the VERDICT-mandated decision table: the kernel ships default-ON only
where it beats XLA).

Timing through the axon relay: block_until_ready returns early, so each
measurement chains ITERS sequential applications inside one jit (output feeds
the next input) and fetches one scalar at the end - the per-iteration cost is
(fetch-to-fetch time) / ITERS.

Run on the real TPU:  PYTHONPATH=. python tools/bench_window_attention.py
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

ITERS = 20
BATCH = 8
H0, W0 = 352, 1216


def stage_shapes():
    """(heads, nwh, nww, N, D) per Swin-L stage at 352x1216, window 7."""
    out = []
    for i, heads in enumerate((6, 12, 24, 48)):
        h = (H0 // 4 + 2 ** i - 1) // (2 ** i)
        w = (W0 // 4 + 2 ** i - 1) // (2 ** i)
        hp = (h + 6) // 7 * 7
        wp = (w + 6) // 7 * 7
        out.append((heads, hp // 7, wp // 7, 49, 32, hp, wp))
    return out


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = str(Path(__file__).parent.parent / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffusiondepth_tpu.models.backbones.swin import shifted_window_mask
    from diffusiondepth_tpu.ops.window_attention import (
        window_attention_pallas,
        window_attention_reference,
    )

    rows = []
    for heads, nwh, nww, n, d, hp, wp in stage_shapes():
        nw = nwh * nww
        rng = np.random.RandomState(0)
        shp = (BATCH, nw, heads, n, d)
        q = jnp.asarray(rng.randn(*shp), jnp.bfloat16)
        k = jnp.asarray(rng.randn(*shp), jnp.bfloat16)
        v = jnp.asarray(rng.randn(*shp), jnp.bfloat16)
        bias = jnp.asarray(rng.randn(heads, n, n).astype(np.float32) * 0.1)
        scale = d ** -0.5

        for shifted in (False, True):
            mask = (jnp.asarray(shifted_window_mask(hp, wp, 7, 3))
                    if shifted else None)

            def chain(fn):
                # k/v/bias/mask must be jit ARGUMENTS: closed-over arrays are
                # embedded as HLO constants (~170 MB of program through the
                # axon tunnel per config - compiles take tens of minutes)
                def run(q0, k, v, bias, mask):
                    def body(c, _):
                        o = fn(c, k, v, bias, mask, scale)
                        return o.astype(c.dtype), ()
                    out, _ = jax.lax.scan(body, q0, None, length=ITERS)
                    return out[0, 0, 0, 0, 0].astype(jnp.float32)
                return jax.jit(run)

            results = {}
            for name, fn in (
                ("xla", window_attention_reference),
                ("pallas", window_attention_pallas),
            ):
                f = chain(fn)
                float(f(q, k, v, bias, mask))  # compile + warm
                t0 = time.perf_counter()
                float(f(q, k, v, bias, mask))
                dt = (time.perf_counter() - t0) / ITERS
                results[name] = dt * 1e3

            speedup = results["xla"] / results["pallas"]
            rows.append({
                "stage": f"h{heads} nW{nw} {'shift' if shifted else 'plain'}",
                "xla_ms": round(results["xla"], 3),
                "pallas_ms": round(results["pallas"], 3),
                "speedup": round(speedup, 3),
            })
            print(json.dumps(rows[-1]))

    total_x = sum(r["xla_ms"] for r in rows)
    total_p = sum(r["pallas_ms"] for r in rows)
    print(json.dumps({
        "stage": "TOTAL (sum of stage shapes, 1 layer each)",
        "xla_ms": round(total_x, 3),
        "pallas_ms": round(total_p, 3),
        "speedup": round(total_x / total_p, 3),
    }))


if __name__ == "__main__":
    main()
