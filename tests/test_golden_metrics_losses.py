"""Golden parity vs the REFERENCE's own metric / loss code (torch-only,
imported directly from /root/reference/src): the 8 depth metrics and the
L1/L2 losses must match our jnp implementations on identical inputs."""

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

from diffusiondepth_tpu.losses import l1_loss, l2_loss
from diffusiondepth_tpu.metrics import evaluate_depth_metrics

REF_SRC = "/root/reference/src"


class _Args:
    max_depth = 80.0
    model_name = "Diffusion_DCbase_"


def _load(relpath, name, package_shim=None):
    """Load a reference module by path, shimming its relative imports."""
    spec = importlib.util.spec_from_file_location(name, f"{REF_SRC}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    if package_shim:
        sys.modules[name.rsplit(".", 1)[0]] = package_shim
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_metric():
    # shim the 'metric' package: only BaseMetric is needed
    pkg = types.ModuleType("refmetric")
    pkg.__path__ = [f"{REF_SRC}/metric"]

    class BaseMetric:
        def __init__(self, args):
            self.args = args

    pkg.BaseMetric = BaseMetric
    mod = _load("metric/diffusion_dcbase_metric.py",
                "refmetric.diffusion_dcbase_metric", package_shim=pkg)
    return mod.Diffusion_DCbase_Metric(_Args())


def _sample(seed=0, b=3, h=16, w=24):
    rng = np.random.RandomState(seed)
    gt = rng.rand(b, h, w, 1).astype(np.float32) * 85
    gt[gt < 10] = 0.0  # invalid holes
    pred = np.clip(gt + rng.randn(b, h, w, 1).astype(np.float32) * 2, 0, None)
    return pred, gt


def test_metrics_match_reference(ref_metric):
    pred, gt = _sample()
    # reference evaluates NCHW torch tensors
    t_sample = {"gt": torch.from_numpy(gt.transpose(0, 3, 1, 2))}
    t_output = {"pred": torch.from_numpy(pred.transpose(0, 3, 1, 2))}
    ref_rows = ref_metric.evaluate(t_sample, t_output, "test").numpy()

    ours = np.asarray(evaluate_depth_metrics({"gt": gt}, {"pred": pred}))
    # reference returns one (1, 8) row of batch means
    np.testing.assert_allclose(ours, ref_rows, rtol=1e-4, atol=1e-5)


@pytest.fixture(scope="module")
def ref_losses():
    l1 = _load("loss/submodule/l1loss.py", "refloss_l1")
    l2 = _load("loss/submodule/l2loss.py", "refloss_l2")
    return l1.L1Loss(_Args()), l2.L2Loss(_Args())


def test_l1_l2_losses_match_reference(ref_losses):
    ref_l1, ref_l2 = ref_losses
    pred, gt = _sample(seed=1)
    tp = torch.from_numpy(pred.transpose(0, 3, 1, 2))
    tg = torch.from_numpy(gt.transpose(0, 3, 1, 2))
    np.testing.assert_allclose(
        float(l1_loss(pred, gt, _Args.max_depth)),
        float(ref_l1(tp, tg)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(l2_loss(pred, gt, _Args.max_depth)),
        float(ref_l2(tp, tg)), rtol=1e-5,
    )
