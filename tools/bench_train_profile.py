"""Profile the flagship bs4 train micro-step and print the device-time
breakdown.

Closes the ledger's pending A/B: (a) confirm the te-fusion commit (e00e7e5)
removed the per-step pad/broadcast_add ops from the sampler scan, and
(b) keep/revert the th=16 small-channel backward tile — both judged on the
device timeline (the axon relay's fixed dispatch cost makes wall-clock
ambiguous below ~0.1 s).  Prior recorded device step: 1000.95 ms (r4 trace,
before either change).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/bench_train_profile.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

H, W, BS, STEPS = 352, 906, 4, 20


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

    from diffusiondepth_tpu.config import Config
    from diffusiondepth_tpu.losses import LossComputer
    from diffusiondepth_tpu.models import build_model
    from diffusiondepth_tpu.training.optim import make_optimizer
    from diffusiondepth_tpu.training.steps import make_train_step
    from diffusiondepth_tpu.training.train_state import create_train_state

    cfg = Config(
        model_name="Diffusion_DCbase_",
        backbone_module="swin",
        backbone_name="swin_large_naive_l4w722422k",
        head_specify="DDIMDepthEstimate_Swin_ADDHAHI",
        inference_steps=STEPS,
        opt_level="O1",
        batch_size=BS,
        patch_height=H,
        patch_width=W,
        max_depth=88.0,
    ).finalize()
    model = build_model(cfg)
    lc = LossComputer(cfg)

    rng = np.random.RandomState(1)
    gt = np.clip(rng.rand(BS, H, W, 1) * 80, 0, 88).astype(np.float32)
    batch = {
        "rgb": rng.randn(BS, H, W, 3).astype(np.float32),
        "dep": gt * (rng.rand(BS, H, W, 1) > 0.9),
        "gt": gt,
        "depth_map": gt,
        "depth_mask": np.ones((BS, H, W, 1), np.float32),
    }
    tx = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(
        model, tx, {k: v[:1] for k, v in batch.items()}, jax.random.PRNGKey(0)
    )
    step = make_train_step(model, lc, accum_steps=1)
    key = jax.random.PRNGKey(3)

    state, loss, _, _ = step(state, batch, jax.random.fold_in(key, 0))
    print("compiled; loss", float(loss), flush=True)

    n = 3
    trace_dir = "/tmp/train_profile"
    with jax.profiler.trace(trace_dir):
        t0 = time.perf_counter()
        for i in range(1, n + 1):
            state, loss, _, _ = step(state, batch, jax.random.fold_in(key, i))
        _ = float(loss)
        dt = (time.perf_counter() - t0) / n
    print(
        f"wall {dt:.3f} s/step (bs{BS} micro, {n} steps; measured UNDER "
        "jax.profiler.trace — includes trace-collection overhead, not "
        "comparable to untraced wall reads)",
        flush=True,
    )

    from diffusiondepth_tpu.tools.analyze_trace import main as analyze

    analyze([trace_dir, "--top", "30"])


if __name__ == "__main__":
    main()
