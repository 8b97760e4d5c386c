"""Converter CLI (tools/convert_checkpoint.py): reference torch .pt ->
framework msgpack checkpoint, loadable by --pretrain / export / eval_parity.
Reuses the synthetic reference-layout state dict from the full-model
converter test."""

import numpy as np
import pytest
import torch

from test_convert_full_model import _synth_reference_sd

from diffusiondepth_tpu.tools.convert_checkpoint import main as convert_main
from diffusiondepth_tpu.utils.checkpoint import load_checkpoint


@pytest.mark.slow
def test_convert_cli_end_to_end(tmp_path):
    sd = _synth_reference_sd()  # swin-tiny + ADDHAHI layout
    pt = str(tmp_path / "model_00022.pt")
    torch.save({"net": {k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()}}, pt)

    out_dir = str(tmp_path / "converted")
    rc = convert_main([
        "--torch", pt, "--out_dir", out_dir, "--epoch", "22",
        "--model_name", "Diffusion_DCbase_",
        "--backbone_module", "swin", "--backbone_name", "swin_tiny",
        "--head_specify", "DDIMDepthEstimate_Swin_ADDHAHI",
        "--head_in_channels", "96,192,384,768",
        "--inference_steps", "2",
    ])
    assert rc == 0

    payload = load_checkpoint(f"{out_dir}/model_00022.ckpt")
    assert "params" in payload and "batch_stats" in payload
    # args.json round-trips the architecture so downstream tools rebuild it
    cfg = payload["args"]
    assert cfg.backbone_name == "swin_tiny"
    assert cfg.head_in_channels == "96,192,384,768"
    # a converted leaf carries the torch value (layout rule applied)
    qkv = payload["params"]["depth_backbone"]["stage0_block0"][
        "attn"]["qkv"]["kernel"]
    want = sd["depth_backbone.stages.0.blocks.0.attn.w_msa.qkv.weight"].T
    np.testing.assert_allclose(np.asarray(qkv), want, atol=1e-6)


def test_convert_cli_rejects_unknown_layout(tmp_path):
    pt = str(tmp_path / "junk.pt")
    torch.save({"net": {"some.unknown.weight": torch.zeros(3, 3)}}, pt)
    rc = convert_main([
        "--torch", pt, "--out_dir", str(tmp_path / "x"),
        "--model_name", "Diffusion_DCbase_",
        "--backbone_module", "mmbev_resnet", "--backbone_name", "mmbev_res18",
        "--head_specify", "DDIMDepthEstimate_Res", "--inference_steps", "2",
    ])
    assert rc == 1  # zero leaves replaced -> explicit failure
