"""Real-chip AOT export check: export the fused-kernel model's predict step
(StableHLO incl. Mosaic custom calls), serialize -> deserialize -> call on
the REAL TPU, and compare bitwise vs the directly-jitted apply."""
import sys, time
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parents[1] / ".jax_cache"))
from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.tools.export_model import (
    export_predict, make_predict_fn, save_exported, load_exported,
    serving_batch_spec,
)

cfg = Config(
    model_name="Diffusion_DCbase_",
    backbone_module="swin", backbone_name="swin_micro",
    head_specify="DDIMDepthEstimate_Swin_ADDHAHI", inference_steps=4,
    head_in_channels="32,64,128,256",
    opt_level="O1", max_depth=88.0,
).finalize()
model = build_model(cfg)
B, H, W = 2, 64, 96
rng = np.random.RandomState(0)
gt = np.clip(rng.rand(B, H, W, 1) * 80, 0, 88).astype(np.float32)
batch = {
    "rgb": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
    "dep": jnp.asarray(gt), "gt": jnp.asarray(gt),
    "depth_map": jnp.asarray(gt),
    "depth_mask": jnp.ones((B, H, W, 1), jnp.float32),
}
variables = model.init(
    {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
    batch, train=False)
print("init done", flush=True)

t0 = time.perf_counter()
exported = export_predict(model, variables, serving_batch_spec(B, H, W))
save_exported(exported, "/tmp/tpu_export_check.jaxport")
print(f"exported + serialized ({time.perf_counter()-t0:.1f}s)", flush=True)

reloaded = load_exported("/tmp/tpu_export_check.jaxport")
key = jax.random.PRNGKey(7)
out_art = np.asarray(reloaded.call(variables, batch, key))
predict = jax.jit(make_predict_fn(model))
out_jit = np.asarray(predict(variables, batch, key))
assert out_art.shape == out_jit.shape == (B, H, W, 1)
np.testing.assert_array_equal(out_art, out_jit)
print("TPU_EXPORT_ROUNDTRIP_BITWISE_OK", out_art.shape, flush=True)
