"""Statistical accuracy-parity harness smoke tests (SURVEY.md §7 protocol;
reference eval loop src/main.py:404-491). Synthetic data stands in for
KITTI/NYU: the harness must produce per-seed metric rows, mean/std/min/max
aggregates, and a parity verdict against supplied reference values."""

import json

import numpy as np
import pytest

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.metrics import METRIC_NAMES
from diffusiondepth_tpu.tools.eval_parity import (
    _load_reference_metrics,
    main as parity_main,
    run_parity_eval,
)


@pytest.fixture(scope="module")
def report():
    cfg = Config(
        data_name="Synthetic",
        model_name="Diffusion_DCbase_",
        backbone_module="mmbev_resnet",
        backbone_name="mmbev_res18",
        head_specify="DDIMDepthEstimate_Res",
        patch_height=32,
        patch_width=48,
        test_batch_size=8,
        inference_steps=2,
    ).finalize()
    return run_parity_eval(cfg, n_seeds=2)


def test_report_structure(report):
    assert report["protocol"]["n_seeds"] == 2
    assert report["protocol"]["num_samples"] == 16
    assert set(report["metrics"]) == set(METRIC_NAMES)
    for m in report["metrics"].values():
        assert np.isfinite(m["mean"])
        assert m["min"] <= m["mean"] <= m["max"]
        assert m["std"] >= 0


def test_seed_variation_is_nonzero(report):
    """Different latent seeds must actually change the diffusion output (the
    spread is the whole point of the statistical protocol)."""
    spreads = [m["max"] - m["min"] for m in report["metrics"].values()]
    assert any(s > 0 for s in spreads)


@pytest.mark.slow
def test_parity_verdict_against_reference_values(tmp_path):
    cfg = Config(
        data_name="Synthetic",
        model_name="Diffusion_DCbase_",
        backbone_module="mmbev_resnet",
        backbone_name="mmbev_res18",
        head_specify="DDIMDepthEstimate_Res",
        patch_height=32,
        patch_width=48,
        test_batch_size=8,
        inference_steps=2,
    ).finalize()
    base = run_parity_eval(cfg, n_seeds=1)
    vals = {k: v["mean"] for k, v in base["metrics"].items()}

    # identical reference values -> parity
    rep = run_parity_eval(cfg, n_seeds=1, reference_metrics=vals)
    assert rep["parity"] is True
    for m in rep["metrics"].values():
        assert m["within_tolerance"] and abs(m["rel_dev"]) < 1e-6

    # wildly different reference values -> no parity
    rep2 = run_parity_eval(
        cfg, n_seeds=1,
        reference_metrics={k: v * 10 + 5 for k, v in vals.items()},
    )
    assert rep2["parity"] is False


def test_reference_metrics_loader(tmp_path):
    path = tmp_path / "ref.json"
    path.write_text(json.dumps(
        {"kitti_swin": {"RMSE": 0.9801, "MAE": 0.4254, "note": "x"},
         "RMSE": 9.9}
    ))
    assert _load_reference_metrics(f"{path}#kitti_swin") == {
        "RMSE": 0.9801, "MAE": 0.4254,
    }
    assert _load_reference_metrics(str(path))["RMSE"] == 9.9


def test_cli_entry_writes_report(tmp_path):
    out = tmp_path / "parity.json"
    parity_main([
        "--data_name", "Synthetic",
        "--model_name", "Diffusion_DCbase_",
        "--backbone_module", "mmbev_resnet",
        "--backbone_name", "mmbev_res18",
        "--head_specify", "DDIMDepthEstimate_Res",
        "--patch_height", "32", "--patch_width", "48",
        "--test_batch_size", "8",
        "--inference_steps", "2",
        "--parity_seeds", "1",
        "--parity_out", str(out),
    ])
    rep = json.loads(out.read_text())
    assert set(rep["metrics"]) == set(METRIC_NAMES)
