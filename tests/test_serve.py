"""Artifact-based batch serving (tools/serve.py): PNGs in -> KITTI-format
uint16 submission PNGs out, using only the exported artifact + checkpoint
(no model-building code on the serving path)."""

import os

import jax
import numpy as np
from PIL import Image

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.tools.export_model import (
    export_predict,
    save_exported,
    serving_batch_spec,
)
from diffusiondepth_tpu.tools.serve import main as serve_main


def test_serve_dir_end_to_end(tmp_path):
    """5 input frames at artifact batch 2 (ragged tail) -> 5 output PNGs in
    the reference submission encoding, deterministic for a fixed seed."""
    B, H, W = 2, 32, 48
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
    init_batch = {
        k: jax.numpy.asarray(v) for k, v in {
            "rgb": rng.rand(B, H, W, 3).astype(np.float32),
            "dep": rng.rand(B, H, W, 1).astype(np.float32) * 10,
            "gt": rng.rand(B, H, W, 1).astype(np.float32) * 10,
            "depth_map": rng.rand(B, H, W, 1).astype(np.float32) * 10,
            "depth_mask": np.ones((B, H, W, 1), np.float32),
        }.items()
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        init_batch, train=False,
    )

    # checkpoint (what the serving host ships next to the artifact)
    from flax import serialization

    ckpt = str(tmp_path / "model.ckpt")
    with open(ckpt, "wb") as f:
        f.write(serialization.msgpack_serialize({
            "params": serialization.to_state_dict(
                jax.tree_util.tree_map(np.asarray, variables["params"])),
            "batch_stats": serialization.to_state_dict(
                jax.tree_util.tree_map(
                    np.asarray, variables.get("batch_stats", {}))),
        }))

    art = str(tmp_path / "model.jaxport")
    save_exported(
        export_predict(model, variables, serving_batch_spec(B, H, W)), art
    )

    # 5 synthetic frames (ragged final batch of 1)
    rgb_dir = tmp_path / "rgb"
    dep_dir = tmp_path / "dep"
    out_dir = tmp_path / "out"
    rgb_dir.mkdir()
    dep_dir.mkdir()
    for i in range(5):
        Image.fromarray(
            (rng.rand(H, W, 3) * 255).astype(np.uint8)
        ).save(rgb_dir / f"{i:04d}.png")
        Image.fromarray(
            (rng.rand(H, W) * 20 * 256).astype(np.uint16)
        ).save(dep_dir / f"{i:04d}.png")

    serve_main([
        "--artifact", art, "--ckpt", ckpt,
        "--rgb_dir", str(rgb_dir), "--dep_dir", str(dep_dir),
        "--out_dir", str(out_dir), "--seed", "3",
    ])

    outs = sorted(os.listdir(out_dir))
    assert outs == [f"{i:04d}.png" for i in range(5)]
    for n in outs:
        d = np.asarray(Image.open(out_dir / n))
        assert d.dtype == np.uint16 and d.shape == (H, W)
        # decodes back to plausible meters like the KITTI loader would
        assert (d.astype(np.float32) / 256.0).max() < 256.0
