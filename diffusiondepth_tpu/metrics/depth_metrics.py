"""Depth evaluation metrics.

Re-implements ``Diffusion_DCbase_Metric`` / ``NLSPNMetric`` (identical math;
reference: src/metric/diffusion_dcbase_metric.py:27-93): 8 metrics over valid
pixels (gt > 1e-4): RMSE, MAE, iRMSE, iMAE, REL, delta<1.25^{1,2,3}.

The reference gathers valid pixels with boolean indexing (dynamic shapes);
here the same numbers are produced with masked reductions - static shapes,
jittable, and batchable (reference runs at batch 1; this computes the
reference's exact per-batch aggregate for any batch size).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

METRIC_NAMES = ["RMSE", "MAE", "iRMSE", "iMAE", "REL", "D^1", "D^2", "D^3"]

T_VALID = 1e-4


def evaluate_depth_metrics(sample: Dict, output: Dict) -> jnp.ndarray:
    """Returns a (1, 8) row of metrics, matching the reference's
    ``evaluate(sample, output, mode)`` output layout (:89-93)."""
    pred = output["pred"].astype(jnp.float32)
    gt = sample["gt"].astype(jnp.float32)

    mask = gt > T_VALID
    m = mask.astype(jnp.float32)
    num_valid = jnp.sum(m)
    denom = num_valid + 1e-8

    pred_inv = jnp.where(pred > T_VALID, 1.0 / (pred + 1e-8), 0.0)
    gt_inv = jnp.where(gt > T_VALID, 1.0 / (gt + 1e-8), 0.0)

    diff = (pred - gt) * m
    rmse = jnp.sqrt(jnp.sum(jnp.square(diff)) / denom)
    mae = jnp.sum(jnp.abs(diff)) / denom

    diff_inv = (pred_inv - gt_inv) * m
    irmse = jnp.sqrt(jnp.sum(jnp.square(diff_inv)) / denom)
    imae = jnp.sum(jnp.abs(diff_inv)) / denom

    rel = jnp.sum(jnp.abs(diff) / (gt + 1e-8) * m) / denom

    r1 = gt / (pred + 1e-8)
    r2 = pred / (gt + 1e-8)
    ratio = jnp.maximum(r1, r2)
    d1 = jnp.sum((ratio < 1.25).astype(jnp.float32) * m) / denom
    d2 = jnp.sum((ratio < 1.25 ** 2).astype(jnp.float32) * m) / denom
    d3 = jnp.sum((ratio < 1.25 ** 3).astype(jnp.float32) * m) / denom

    return jnp.stack([rmse, mae, irmse, imae, rel, d1, d2, d3])[None]


class DepthMetric:
    """Object wrapper mirroring the reference metric plugin API."""

    metric_name = METRIC_NAMES

    def __init__(self, args):
        self.args = args
        self.t_valid = T_VALID
        self._jitted = jax.jit(evaluate_depth_metrics)

    def evaluate(self, sample: Dict, output: Dict, mode: str = "test") -> jnp.ndarray:
        del mode
        return self._jitted(
            {"gt": sample["gt"]}, {"pred": output["pred"]}
        )


# Both model families share the same metric math in the reference
# (diffusion_dcbase_metric.py == nlspnmetric.py).
Diffusion_DCbase_Metric = DepthMetric
NLSPNMetric = DepthMetric


def get_metric(args):
    """Reference-style factory (src/metric/__init__.py:22-27)."""
    return lambda a=args: DepthMetric(a)
