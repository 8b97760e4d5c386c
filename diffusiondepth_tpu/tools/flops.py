"""Model-FLOP accounting via XLA HLO cost analysis, for MFU reporting.

The reference never reports FLOPs; perf there is wall-clock prints
(src/main.py:489-491). Here the benchmark (bench.py) reports MFU — measured
throughput against the chip's peak — which requires a trustworthy per-frame
FLOP count for the flagship pipeline.

Two XLA facts shape the method (verified empirically on this tree):

* ``Lowered.cost_analysis()`` / ``Compiled.cost_analysis()`` count a
  while-loop (``lax.scan``) body ONCE regardless of trip count, so a single
  cost analysis of the full model under-counts the N-step DDIM sampler by
  (N-1) denoiser evaluations.
* Pallas custom calls are opaque to HLO cost analysis (0 flops), so the
  fused denoiser chain must be counted through its jnp-equivalent lowering
  (``fused_denoiser=False`` — numerically the same convs).

Decomposition used here::

    F_fwd(N steps) = F_model_reported(scan counted once)
                     + (N - 1) * [F_denoiser + F_sched_step]

Training model-FLOPs use the standard 3x-forward convention (backward ~= 2x
forward). Rematerialisation replays forward work in the backward, so the
*hardware* FLOP count is higher — MFU reported from model-FLOPs is the
conservative (PaLM-style) number.

Everything is computed from ``jit(...).lower()`` on abstract
``ShapeDtypeStruct`` args: no arrays are allocated and nothing executes, so
Swin-L at full KITTI resolution traces in ~a minute on the 1-core host.
Results are cached in ``flops_table.json`` next to this file (committed) so
``bench.py`` never pays the trace at benchmark time.

CLI: python -m diffusiondepth_tpu.tools.flops [--refresh]
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Dict, Optional

CACHE = Path(__file__).with_name("flops_table.json")

# bf16 MXU peak of one v5e chip (jax-ml scaling-book hardware table).
PEAK_FLOPS_BY_KIND = {
    "TPU v5e": 197e12,
    "TPU v5 lite": 197e12,
    "TPU v5lite": 197e12,
}
DEFAULT_PEAK_FLOPS = 197e12


def peak_flops(device_kind: str) -> float:
    for k, v in PEAK_FLOPS_BY_KIND.items():
        if k.lower() in device_kind.lower():
            return v
    return DEFAULT_PEAK_FLOPS


def _flops(cost) -> float:
    if cost is None:
        raise RuntimeError("cost_analysis unavailable on this backend")
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return float(cost["flops"])


def _key(backbone: str, head: str, h: int, w: int, bs: int, steps: int) -> str:
    return f"{backbone}|{head}|{h}x{w}|bs{bs}|steps{steps}"


def compute_fwd_flops(
    backbone_module: str,
    backbone_name: str,
    head: str,
    h: int,
    w: int,
    bs: int,
    steps: int,
    train: bool = False,
) -> float:
    """Total forward model-FLOPs of one batch (NOT per frame)."""
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..diffusion.ddim import DDIMSchedule
    from ..models import build_model
    from ..models.heads.denoiser import ScheduledCNNRefine

    cfg = Config(
        model_name="Diffusion_DCbase_",
        backbone_module=backbone_module,
        backbone_name=backbone_name,
        head_specify=head,
        inference_steps=steps,
        opt_level="O1",
        batch_size=bs,
        patch_height=h,
        patch_width=w,
        max_depth=88.0,
        fused_denoiser=False,  # jnp path: visible to HLO cost analysis
    ).finalize()
    model = build_model(cfg)

    f32 = jnp.float32
    batch = {
        "rgb": jax.ShapeDtypeStruct((bs, h, w, 3), f32),
        "dep": jax.ShapeDtypeStruct((bs, h, w, 1), f32),
        "gt": jax.ShapeDtypeStruct((bs, h, w, 1), f32),
        "depth_map": jax.ShapeDtypeStruct((bs, h, w, 1), f32),
        "depth_mask": jax.ShapeDtypeStruct((bs, h, w, 1), f32),
    }
    rngs = {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)}
    variables = jax.eval_shape(lambda b: model.init(rngs, b, train=False), batch)

    run_rngs = {"diffusion": jax.random.PRNGKey(2)}
    if train:
        run_rngs["dropout"] = jax.random.PRNGKey(3)

        def fwd(v, b):
            out, _ = model.apply(
                v, b, train=True, rngs=run_rngs, mutable=["batch_stats"]
            )
            return out["pred"], out["ddim_loss"]

    else:

        def fwd(v, b):
            return model.apply(v, b, train=False, rngs=run_rngs)["pred"]

    f_model = _flops(jax.jit(fwd).lower(variables, batch).cost_analysis())

    # ---- one sampler-scan body, counted standalone (no loop => exact):
    # denoiser at the latent resolution (default DeepDepthTransform family:
    # half the input resolution, 16 channels) + the DDIM update
    lh, lw = -(-h // 2), -(-w // 2)
    from ..registry import HEADS

    head_cls = HEADS.get(head)  # dataclass defaults carry the dims
    den = ScheduledCNNRefine(
        channels_in=head_cls.fpn_dim,
        channels_noise=head_cls.depth_feature_dim,
        fuse=head_cls.fuse,
        use_fused=False,
        dtype=jnp.bfloat16,
    )
    lat = jax.ShapeDtypeStruct((bs, lh, lw, head_cls.depth_feature_dim), f32)
    cond = jax.ShapeDtypeStruct((bs, lh, lw, head_cls.fpn_dim), jnp.bfloat16)
    den_vars = jax.eval_shape(
        lambda a, c: den.init(jax.random.PRNGKey(0), a, 0, c), lat, cond
    )
    f_den = _flops(
        jax.jit(lambda v, a, c: den.apply(v, a, 0, c))
        .lower(den_vars, lat, cond)
        .cost_analysis()
    )

    sched = DDIMSchedule(num_train_timesteps=1000, clip_sample=False)
    f_sched = _flops(
        jax.jit(
            lambda e, x: sched.step_from_alphas(
                e, x, jnp.float32(0.5), jnp.float32(0.6),
                eta=0.0, use_clipped_model_output=True,
            )[0]
        )
        .lower(lat, lat)
        .cost_analysis()
    )

    return f_model + (steps - 1) * (f_den + f_sched)


SWIN_ARGS = ("swin", "swin_large_naive_l4w722422k",
             "DDIMDepthEstimate_Swin_ADDHAHI")

# (backbone_module, backbone_name, head, h, w, bs, steps, train) of every
# entry bench.py reads: the flagship eval/train pair plus the published
# model rows and the 50-step leaderboard protocol (BASELINE.md)
BENCH_SPECS = (
    SWIN_ARGS + (352, 1216, 8, 20, False),
    SWIN_ARGS + (352, 906, 8, 20, True),
    SWIN_ARGS + (352, 1216, 8, 50, False),  # leaderboard protocol (x2 TTA)
    ("mmbev_resnet", "mmbev_res50", "DDIMDepthEstimate_Res",
     352, 1216, 8, 20, False),
    ("mpvit", "mpvit_small", "DDIMDepthEstimate_MPVIT_ADDHAHI",
     352, 1216, 8, 20, False),
)


def compute_entries(specs=BENCH_SPECS, existing: Optional[Dict] = None
                    ) -> Dict[str, Dict[str, float]]:
    """Compute the cache entries for ``specs`` that ``existing`` lacks."""
    out = {}
    for (mod, name, head, h, w, bs, steps, train) in specs:
        key = _key(name, head, h, w, bs, steps)
        if existing and key in existing:
            continue
        f = compute_fwd_flops(mod, name, head, h, w, bs, steps, train=train)
        out[key] = {
            "fwd_flops_batch": f,
            "fwd_flops_frame": f / bs,
            "train": bool(train),
        }
    return out


def flagship_entries() -> Dict[str, Dict[str, float]]:
    """Back-compat alias: the flagship eval/train pair."""
    return compute_entries(BENCH_SPECS[:2])


def lookup(backbone_name: str, head: str, h: int, w: int, bs: int,
           steps: int) -> Optional[Dict[str, float]]:
    if not CACHE.exists():
        return None
    table = json.loads(CACHE.read_text())
    return table.get(_key(backbone_name, head, h, w, bs, steps))


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--refresh", action="store_true",
                   help="recompute even if the cache exists")
    args = p.parse_args(argv)

    import jax

    # tracing-only workload: force the CPU client so nothing touches the TPU
    # relay (conftest.py does the same; the env var alone is not enough here)
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    table = json.loads(CACHE.read_text()) if CACHE.exists() else {}
    new = compute_entries(existing=None if args.refresh else table)
    if new:
        table.update(new)
        CACHE.write_text(json.dumps(table, indent=1, sort_keys=True))
    for k, v in table.items():
        print(f"{k}: {v['fwd_flops_frame'] / 1e12:.3f} TFLOP/frame fwd")


if __name__ == "__main__":
    main()
