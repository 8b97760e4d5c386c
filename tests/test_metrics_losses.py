"""Metrics and losses vs. hand-computed / torch-computed values (reference
math: src/metric/diffusion_dcbase_metric.py:36-91, src/loss/submodule/)."""

import numpy as np
import jax.numpy as jnp
import torch

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.losses import LossComputer, l1_loss, l2_loss, sig_loss
from diffusiondepth_tpu.metrics import METRIC_NAMES, evaluate_depth_metrics


def _torch_reference_metrics(pred, gt):
    """Reference metric math re-run in torch (formulas from
    diffusion_dcbase_metric.py:36-91)."""
    pred = torch.from_numpy(pred)
    gt = torch.from_numpy(gt)
    t_valid = 0.0001
    pred_inv = 1.0 / (pred + 1e-8)
    gt_inv = 1.0 / (gt + 1e-8)
    mask = gt > t_valid
    num_valid = mask.sum()
    pred_m = pred[mask]
    gt_m = gt[mask]
    pred_inv = pred_inv[mask]
    gt_inv = gt_inv[mask]
    pred_inv[pred_m <= t_valid] = 0.0
    gt_inv[gt_m <= t_valid] = 0.0
    diff = pred_m - gt_m
    rmse = torch.sqrt((diff ** 2).sum() / (num_valid + 1e-8))
    mae = diff.abs().sum() / (num_valid + 1e-8)
    diff_inv = pred_inv - gt_inv
    irmse = torch.sqrt((diff_inv ** 2).sum() / (num_valid + 1e-8))
    imae = diff_inv.abs().sum() / (num_valid + 1e-8)
    rel = (diff.abs() / (gt_m + 1e-8)).sum() / (num_valid + 1e-8)
    r1 = gt_m / (pred_m + 1e-8)
    r2 = pred_m / (gt_m + 1e-8)
    ratio = torch.max(r1, r2)
    d1 = (ratio < 1.25).float().sum() / (num_valid + 1e-8)
    d2 = (ratio < 1.25 ** 2).float().sum() / (num_valid + 1e-8)
    d3 = (ratio < 1.25 ** 3).float().sum() / (num_valid + 1e-8)
    return np.array([rmse, mae, irmse, imae, rel, d1, d2, d3], dtype=np.float32)


def test_metric_names_order():
    assert METRIC_NAMES == ["RMSE", "MAE", "iRMSE", "iMAE", "REL", "D^1", "D^2", "D^3"]


def test_metrics_match_reference_math():
    rng = np.random.RandomState(0)
    gt = rng.uniform(0, 10, (2, 16, 24, 1)).astype(np.float32)
    gt[gt < 2.0] = 0.0  # invalid pixels
    pred = np.clip(gt + rng.randn(2, 16, 24, 1).astype(np.float32), 0.01, None)
    ours = evaluate_depth_metrics({"gt": jnp.asarray(gt)}, {"pred": jnp.asarray(pred)})
    expected = _torch_reference_metrics(pred, gt)
    np.testing.assert_allclose(np.asarray(ours)[0], expected, rtol=1e-4, atol=1e-5)


def test_l1_l2_match_reference_math():
    rng = np.random.RandomState(1)
    gt = rng.uniform(0, 90, (3, 8, 8, 1)).astype(np.float32)
    gt[gt < 30] = 0.0
    pred = rng.uniform(0, 100, (3, 8, 8, 1)).astype(np.float32)
    max_depth = 88.0

    tg = torch.from_numpy(gt).clamp(0, max_depth)
    tp = torch.from_numpy(pred).clamp(0, max_depth)
    mask = (tg > 1e-4).float()
    d1 = ((tp - tg).abs() * mask).sum(dim=[1, 2, 3])
    d2 = (((tp - tg) ** 2) * mask).sum(dim=[1, 2, 3])
    nv = mask.sum(dim=[1, 2, 3])
    exp_l1 = (d1 / (nv + 1e-8)).sum().item()
    exp_l2 = (d2 / (nv + 1e-8)).sum().item()

    np.testing.assert_allclose(
        float(l1_loss(jnp.asarray(pred), jnp.asarray(gt), max_depth)), exp_l1, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(l2_loss(jnp.asarray(pred), jnp.asarray(gt), max_depth)), exp_l2, rtol=1e-5
    )


def test_sig_loss_matches_reference_math():
    rng = np.random.RandomState(2)
    gt = rng.uniform(0, 10, (2, 8, 8, 1)).astype(np.float32)
    gt[gt < 3] = 0.0
    pred = rng.uniform(0.1, 10, (2, 8, 8, 1)).astype(np.float32)

    tp, tg = torch.from_numpy(pred), torch.from_numpy(gt)
    vm = tg > 0
    inp, tar = tp[vm], tg[vm]
    g = torch.log(inp + 0.001) - torch.log(tar + 0.001)
    expected = 2.0 * torch.sqrt(torch.var(g) + 0.15 * torch.mean(g) ** 2)
    ours = sig_loss(jnp.asarray(pred), jnp.asarray(gt))
    np.testing.assert_allclose(float(ours), expected.item(), rtol=1e-4)


def test_loss_computer_spec_parsing_and_total():
    cfg = Config(loss="1.0*L1+0.5*L2+1.0*DDIM", max_depth=88.0).finalize()
    lc = LossComputer(cfg)
    assert lc.loss_name == ["L1", "L2", "DDIM"]
    rng = np.random.RandomState(3)
    gt = rng.uniform(1, 10, (2, 4, 4, 1)).astype(np.float32)
    pred = rng.uniform(1, 10, (2, 4, 4, 1)).astype(np.float32)
    out = {"pred": jnp.asarray(pred), "ddim_loss": jnp.float32(0.25)}
    loss_sum, loss_val = lc.compute({"gt": jnp.asarray(gt)}, out)
    assert loss_val.shape == (1, 4)
    np.testing.assert_allclose(float(loss_sum), float(loss_val[0, :3].sum()), rtol=1e-6)
    np.testing.assert_allclose(float(loss_val[0, 2]), 0.25)
    np.testing.assert_allclose(float(loss_val[0, 3]), float(loss_sum), rtol=1e-6)
