"""AOT export / serving artifact (tools/export_model.py).

The reference has no deployment path (inference = the full training repo,
src/main.py --test_only); the export tool is the TPU-native serving story:
jitted predict step -> serialized StableHLO -> reload-and-run with no model
code. These tests round-trip a small model through serialize/deserialize on
the CPU test platform and pin the CLI end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.tools.export_model import (
    export_predict,
    load_exported,
    make_predict_fn,
    save_exported,
    serving_batch_spec,
)


def _tiny_setup(tta=False, B=1, H=32, W=48):
    cfg = Config(
        model_name="Diffusion_DCbase_",
        backbone_module="mmbev_resnet",
        backbone_name="mmbev_res18",
        head_specify="DDIMDepthEstimate_Res",
        inference_steps=2,
        batch_size=B,
        max_depth=88.0,
    ).finalize()
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    gt = np.clip(rng.rand(B, H, W, 1) * 80 + 1, 0, 88).astype(np.float32)
    batch = {
        "rgb": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "dep": jnp.asarray(gt * (rng.rand(B, H, W, 1) > 0.8)),
        "gt": jnp.asarray(gt),
        "depth_map": jnp.asarray(gt),
        "depth_mask": jnp.ones((B, H, W, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    return cfg, model, variables, batch


def test_export_roundtrip_matches_direct_apply(tmp_path):
    """serialize -> deserialize -> call == the live jitted predict, bitwise
    (same platform, same lowering)."""
    cfg, model, variables, batch = _tiny_setup()
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    exported = export_predict(model, variables, spec)
    path = str(tmp_path / "model.jaxport")
    save_exported(exported, path)

    reloaded = load_exported(path)
    rng = jax.random.PRNGKey(7)
    got = np.asarray(reloaded.call(variables, batch, rng))

    predict = make_predict_fn(model)
    want = np.asarray(jax.jit(predict)(variables, batch, rng))
    assert got.shape == want.shape == batch["gt"].shape
    np.testing.assert_array_equal(got, want)


def test_exported_artifact_runs_under_outer_jit(tmp_path):
    """Exported.call retraces into an outer jit (how a serving host embeds
    the artifact in its own step, e.g. under a mesh)."""
    cfg, model, variables, batch = _tiny_setup()
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    exported = export_predict(model, variables, spec)
    rng = jax.random.PRNGKey(3)

    @jax.jit
    def serve(variables, batch, rng):
        pred = exported.call(variables, batch, rng)
        return pred, jnp.mean(pred)

    pred, mean = serve(variables, batch, rng)
    assert np.isfinite(float(mean))
    assert pred.shape == batch["gt"].shape


def test_exported_artifact_shards_over_mesh():
    """Data-parallel serving: the artifact retraces under jit with the batch
    sharded over a mesh 'data' axis and params replicated; predictions match
    the single-device call (the serving-host scale-out pattern — GSPMD
    partitions the exported computation like any traced fn)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from diffusiondepth_tpu.parallel import create_mesh, shard_batch

    cfg, model, variables, batch = _tiny_setup(B=8)
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    exported = export_predict(model, variables, spec)
    rng = jax.random.PRNGKey(9)
    want = np.asarray(exported.call(variables, batch, rng))

    mesh = create_mesh("data:8")
    repl = NamedSharding(mesh, P())
    variables_r = jax.device_put(variables, repl)
    batch_s = shard_batch(batch, mesh)

    @jax.jit
    def serve(v, b, r):
        return exported.call(v, b, r)

    got = serve(variables_r, batch_s, jax.device_put(rng, repl))
    assert len(got.sharding.device_set) == 8, got.sharding
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)


def test_export_tta_flip_parity(tmp_path):
    """The --tta artifact equals the flip-ensemble computed by hand."""
    cfg, model, variables, batch = _tiny_setup(tta=True, B=2)
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    exported = export_predict(model, variables, spec, tta_flip=True)
    rng = jax.random.PRNGKey(5)
    got = np.asarray(exported.call(variables, batch, rng))
    want = np.asarray(
        jax.jit(make_predict_fn(model, tta_flip=True))(variables, batch, rng)
    )
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("model_name", ["Diffusion_DCx4base_", "NLSPN"])
def test_export_other_model_families(tmp_path, model_name):
    """The export path is model-agnostic: the x4 (quarter-res latent
    transform) and legacy NLSPN families round-trip too."""
    B, H, W = 1, 32, 48
    cfg = Config(
        model_name=model_name,
        backbone_module="mmbev_resnet",
        backbone_name="mmbev_res18",
        head_specify="DDIMDepthEstimate_Res",
        inference_steps=2,
        batch_size=B,
        max_depth=88.0,
    ).finalize()
    model = build_model(cfg)
    rng = np.random.RandomState(1)
    gt = np.clip(rng.rand(B, H, W, 1) * 80 + 1, 0, 88).astype(np.float32)
    batch = {
        "rgb": jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32)),
        "dep": jnp.asarray(gt * (rng.rand(B, H, W, 1) > 0.8)),
        "gt": jnp.asarray(gt),
        "depth_map": jnp.asarray(gt),
        "depth_mask": jnp.ones((B, H, W, 1), jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    exported = export_predict(model, variables, spec)
    path = str(tmp_path / f"{model_name}.jaxport")
    save_exported(exported, path)
    pred = load_exported(path).call(variables, batch, jax.random.PRNGKey(2))
    assert np.asarray(pred).shape == (B, H, W, 1)
    assert np.isfinite(np.asarray(pred)).all()


def test_export_multi_platform_from_cpu_host(tmp_path):
    """Cross-export: a ('cpu','tpu') artifact built on the CPU test host
    (the off-device export workflow — possible because every custom kernel
    is backend-guarded, so the lowering is pure StableHLO) still round-trips
    and runs on the cpu leg."""
    cfg, model, variables, batch = _tiny_setup()
    spec = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    exported = export_predict(model, variables, spec,
                              platforms=["cpu", "tpu"])
    assert exported.platforms == ("cpu", "tpu")
    path = str(tmp_path / "xplat.jaxport")
    save_exported(exported, path)
    got = load_exported(path).call(variables, batch, jax.random.PRNGKey(1))
    want = jax.jit(make_predict_fn(model))(
        variables, batch, jax.random.PRNGKey(1)
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_export_cli_from_checkpoint(tmp_path):
    """CLI: checkpoint + args.json -> artifact file that reloads and runs."""
    from diffusiondepth_tpu.training.optim import make_optimizer
    from diffusiondepth_tpu.training.train_state import create_train_state
    from diffusiondepth_tpu.utils.checkpoint import save_checkpoint

    cfg, model, variables, batch = _tiny_setup()
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    ckpt = save_checkpoint(str(tmp_path), 1, state, cfg)

    out = str(tmp_path / "served.jaxport")
    from diffusiondepth_tpu.tools.export_model import main

    main(["--ckpt", ckpt, "--out", out,
          "--batch_size", "1", "--height", "32", "--width", "48"])

    reloaded = load_exported(out)
    spec = serving_batch_spec(1, 32, 48)
    sb = {k: jnp.zeros(v.shape, v.dtype) for k, v in spec.items()}
    sb["rgb"] = batch["rgb"]
    sb["dep"] = batch["dep"]
    pred = reloaded.call(
        {"params": state.params, "batch_stats": state.batch_stats},
        sb, jax.random.PRNGKey(11),
    )
    assert np.asarray(pred).shape == (1, 32, 48, 1)
    assert np.isfinite(np.asarray(pred)).all()
