"""Eval fps at several batch sizes after the te-fusion change (flagship
Swin-L + ADDHAHI, KITTI 352x1216, 20 DDIM steps, bf16). Same amortized
lax.scan methodology as bench.py."""
import gc
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

H, W, STEPS = 352, 1216, 20


def run(jax, batch_size, n_iters=10):
    import jax.numpy as jnp

    from diffusiondepth_tpu.config import Config
    from diffusiondepth_tpu.models import build_model

    cfg = Config(
        model_name="Diffusion_DCbase_",
        backbone_module="swin",
        backbone_name="swin_large_naive_l4w722422k",
        head_specify="DDIMDepthEstimate_Swin_ADDHAHI",
        inference_steps=STEPS,
        opt_level="O1",
    ).finalize()
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    gt = np.clip(rng.rand(batch_size, H, W, 1) * 80, 0, 88).astype(np.float32)
    batch = {
        "rgb": jnp.asarray(rng.randn(batch_size, H, W, 3).astype(np.float32)),
        "dep": jnp.asarray(gt),
        "gt": jnp.asarray(gt),
        "depth_map": jnp.asarray(gt),
        "depth_mask": jnp.ones((batch_size, H, W, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )

    @jax.jit
    def forward_k(variables, batch, key):
        def body(carry, i):
            out = model.apply(
                variables, batch, train=False,
                rngs={"diffusion": jax.random.fold_in(key, i)},
            )["pred"]
            return carry, jnp.sum(out.astype(jnp.float32))
        return jax.lax.scan(body, 0, jnp.arange(n_iters))[1]

    key = jax.random.PRNGKey(2)
    _ = float(forward_k(variables, batch, key)[-1])
    best = float("inf")
    for rep in range(2):
        t0 = time.perf_counter()
        _ = float(forward_k(variables, batch, jax.random.fold_in(key, rep))[-1])
        best = min(best, time.perf_counter() - t0)
    fps = n_iters * batch_size / best
    print(f"bs{batch_size}: {best:.3f} s/{n_iters} iters -> {fps:.2f} fps/chip",
          flush=True)
    del variables, batch
    gc.collect()
    return fps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    for bs in [int(a) for a in sys.argv[1:]] or [8, 12]:
        try:
            run(jax, bs)
        except Exception as e:
            print(f"bs{bs}: FAILED {type(e).__name__}: {e}", flush=True)
        gc.collect()


if __name__ == "__main__":
    main()
