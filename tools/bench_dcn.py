"""DCN / MSDA decision benchmark: the XLA gather composition vs its roofline.

SURVEY 2.4 lists the reference's two gather-native CUDA ops — the DCNv2
extension (src/model/deformconv/src/cuda/modulated_deform_conv_cuda.cu) and
mmcv's MultiScaleDeformableAttention — with a Pallas kernel as one candidate
plan. This tool records why the shipped implementation is the XLA
composition (ops/deform_conv.py, ops/msda.py) instead:

Both ops are BILINEAR-GATHER bound: per output element they read 4 corner
values at data-dependent addresses and do O(1) arithmetic on them. On TPU
the vector unit has no VMEM vector-gather; Mosaic/Pallas exposes only
scalar-core dynamic slices (pl.ds), so a hand kernel would SERIALIZE the
per-pixel reads the XLA gather lowering vectorizes. The only remaining
kernel upside would be fusing the gather with the surrounding elementwise
math — which XLA already does — so the decision metric is how close the
composition runs to the HBM roofline of its compulsory gather traffic.
This tool measures exactly that, at the shapes the framework actually runs:

  * NLSPN propagation (the DCNv2 consumer, models/nlspn.py:204-212): the
    full prop_time=18 lax.scan at the KITTI 240x1216 NLSPN patch, C=1,
    3x3 taps — reference nlspnmodel.py:166-172.
  * one generic modulated DCNv2 layer at a mid-pyramid shape (C=64).
  * MSDA at the HAHI configuration (8 heads, head_dim 64, 8 points;
    reference hahi.py:109-118): self-attention over the fused level-1..3
    token stack and cross-attention from level-0 queries, Swin-L KITTI
    352x1216 level shapes.

Timing through the axon relay: block_until_ready returns early, so each
measurement chains many applications inside one jit, fetches one scalar,
and slope-times two chain lengths to cancel the fixed per-dispatch cost
(bench methodology note in CLAUDE.md).

Run on the real TPU:  PYTHONPATH=. python tools/bench_dcn.py
"""

import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

HBM_GBPS = 819.0  # v5e


def _time_fn(make_run, *args, iters):
    """Two-length slope timing: the axon relay adds a FIXED ~0.1 s dispatch
    cost per jitted execution (CLAUDE.md bench methodology), which would
    swamp ms-scale ops. Timing the same scan at lengths N and 3N and taking
    the slope cancels the fixed cost exactly. ``iters`` stays small because
    gather-bound steps can run 10-100 ms and very long scans trip the relay
    watchdog (observed worker crash at 720 chained NLSPN steps)."""
    import jax

    times = {}
    for n in (iters, 3 * iters):
        f = jax.jit(functools.partial(make_run, length=n))
        s = float(np.asarray(f(*args)).ravel()[0])  # compile + warm
        assert np.isfinite(s)
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        t1 = time.perf_counter()
        times[n] = t1 - t0
    return (times[3 * iters] - times[iters]) / (2 * iters)


def bench_nlspn_prop():
    """18-iteration NLSPN propagation scan, KITTI 240x1216, C=1, f32."""
    import jax
    import jax.numpy as jnp

    from diffusiondepth_tpu.ops.deform_conv import modulated_deform_conv

    B, H, W = 1, 240, 1216
    prop_time = 18
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, H, W, 1), jnp.float32)
    offset = jnp.asarray(rng.randn(B, H, W, 18) * 2, jnp.float32)
    aff = jnp.asarray(rng.rand(B, H, W, 9) / 9, jnp.float32)
    w_prop = jnp.ones((3, 3, 1, 1), jnp.float32)

    def run(feat, offset, aff, length=1):
        def step(f, _):
            f = modulated_deform_conv(
                f, offset, aff, w_prop, stride=1, padding=1,
                dilation=1, groups=1, deformable_groups=1,
            )
            return f, None

        out, _ = jax.lax.scan(step, feat, None, length=prop_time * length)
        return jnp.sum(out[0, 0, :1])

    sec = _time_fn(run, feat, offset, aff, iters=3) / prop_time  # per prop iter
    # compulsory traffic per iteration: 4 corner reads per tap (f32), the
    # offset/mask maps, and the feature write-back
    q = B * H * W * 9
    bytes_iter = 4 * q * 4 + offset.size * 4 + aff.size * 4 + B * H * W * 4
    return {
        "case": f"NLSPN prop step ({H}x{W}, C=1, 9 taps)",
        "ms": sec * 1e3,
        "roofline_ms": bytes_iter / (HBM_GBPS * 1e9) * 1e3,
        "bytes_mb": bytes_iter / 1e6,
    }


def bench_nlspn_stencil():
    """The shipped TPU-native path (ops/stencil_prop.py): compile the fixed
    offsets/affinities into a dense stencil once, then 18 gather-free
    shift-and-MAC iterations. Same shapes/inputs as bench_nlspn_prop."""
    import jax
    import jax.numpy as jnp

    from diffusiondepth_tpu.ops.stencil_prop import build_stencil, stencil_apply

    B, H, W, R = 1, 240, 1216, 6
    prop_time = 18
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(B, H, W, 1), jnp.float32)
    offset = jnp.asarray(np.clip(rng.randn(B, H, W, 18) * 2, -R, R),
                         jnp.float32)
    aff = jnp.asarray(rng.rand(B, H, W, 9) / 9, jnp.float32)

    def run(feat, offset, aff, length=1):
        def outer(f, _):
            M = build_stencil(offset, aff, R)

            def step(f, _):
                return stencil_apply(M, f, R), None

            f, _ = jax.lax.scan(step, f, None, length=prop_time)
            return f, None

        out, _ = jax.lax.scan(outer, feat, None, length=length)
        return jnp.sum(out[0, 0, :1])

    sec = _time_fn(run, feat, offset, aff, iters=5)  # per full propagation
    D = 2 * R + 4
    # traffic: build writes M once, each iteration reads M + writes feat
    bytes_total = (offset.size * 4 + aff.size * 4
                   + (prop_time + 1) * B * H * W * D * D * 4
                   + prop_time * B * H * W * 4)
    return {
        "case": f"NLSPN FULL {prop_time}-step propagation, stencil path "
                f"(R={R}, D={D})",
        "ms": sec * 1e3,
        "roofline_ms": bytes_total / (HBM_GBPS * 1e9) * 1e3,
        "bytes_mb": bytes_total / 1e6,
        "gather_path_ms": None,  # filled by main() from the prop-step row
    }


def bench_dcn_layer():
    """One modulated DCNv2, mid-pyramid shape (C=64->64), bf16 activations."""
    import jax.numpy as jnp

    from diffusiondepth_tpu.ops.deform_conv import modulated_deform_conv

    B, H, W, C = 2, 88, 304, 64
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
    offset = jnp.asarray(rng.randn(B, H, W, 18) * 2, jnp.float32)
    mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)

    def run(x, offset, mask, length=1):
        import jax

        def step(f, _):
            f = modulated_deform_conv(f, offset, mask, w, padding=1)
            return f * 0.1, None

        out, _ = jax.lax.scan(step, x, None, length=length)
        return jnp.sum(out[0, 0, 0, :1])

    sec = _time_fn(run, x, offset, mask, iters=10)
    q = B * H * W * 9
    bytes_call = 4 * q * C * 4 + offset.size * 4 + mask.size * 4 + x.size * 4
    flops = 2 * B * H * W * 9 * C * C
    return {
        "case": f"DCNv2 layer ({B}x{H}x{W}, C={C})",
        "ms": sec * 1e3,
        "roofline_ms": bytes_call / (HBM_GBPS * 1e9) * 1e3,
        "bytes_mb": bytes_call / 1e6,
        "matmul_gflop": flops / 1e9,
    }


def _msda_case(nq, label):
    import jax.numpy as jnp

    from diffusiondepth_tpu.ops.msda import ms_deform_attn

    # HAHI at Swin-L KITTI 352x1216: levels 1..3 token shapes
    shapes = [(44, 152), (22, 76), (11, 38)]
    nv = sum(h * w for h, w in shapes)
    B, heads, d, P = 1, 8, 64, 8
    L = len(shapes)
    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, nv, heads, d), jnp.float32)
    loc = jnp.asarray(rng.rand(B, nq, heads, L, P, 2), jnp.float32)
    wgt = jnp.asarray(rng.rand(B, nq, heads, L, P), jnp.float32)
    wgt = wgt / wgt.sum(axis=(-2, -1), keepdims=True)

    def run(value, loc, wgt, length=1):
        import jax

        def step(v, _):
            out = ms_deform_attn(v, shapes, loc, wgt)
            # fold a summary back into value so the chain can't be elided
            return v * (1.0 + 1e-12 * jnp.mean(out)), None

        v, _ = jax.lax.scan(step, value, None, length=length)
        return jnp.sum(v[0, 0, 0, :1])

    sec = _time_fn(run, value, loc, wgt, iters=10)
    bytes_call = (4 * B * nq * heads * L * P * d * 4
                  + loc.size * 4 + wgt.size * 4 + B * nq * heads * d * 4)
    return {
        "case": f"MSDA {label} (Nq={nq}, heads={heads}, L={L}, P={P}, d={d})",
        "ms": sec * 1e3,
        "roofline_ms": bytes_call / (HBM_GBPS * 1e9) * 1e3,
        "bytes_mb": bytes_call / 1e6,
    }


def main():
    import jax

    cache_dir = str(Path(__file__).parent.parent / ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    rows = [
        bench_nlspn_prop(),
        bench_nlspn_stencil(),
        bench_dcn_layer(),
        _msda_case(sum(h * w for h, w in [(44, 152), (22, 76), (11, 38)]),
                   "self-att"),
        _msda_case(88 * 304, "cross-att"),
    ]
    rows[1]["gather_path_ms"] = rows[0]["ms"] * 18  # full 18-step scan
    rows[1]["speedup_vs_gather"] = rows[1]["gather_path_ms"] / rows[1]["ms"]
    for r in rows:
        r["roofline_frac"] = r["roofline_ms"] / r["ms"]
        print(json.dumps(r))


if __name__ == "__main__":
    main()
