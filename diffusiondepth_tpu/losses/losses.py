"""Loss framework.

Re-implements the reference's loss plugin layer:
  * the ``w1*NAME+w2*NAME`` mini-DSL parser (reference: src/loss/__init__.py:40-57)
  * ``Diffusion_DCbase_Loss.compute`` returning ``(loss_sum, per-term vector)``
    (reference: src/loss/diffusion_dcbase_loss.py:14-49)
  * L1/L2 (valid-masked, clamped, per-sample mean then batch SUM - reference:
    src/loss/submodule/l1loss.py:27-42, l2loss.py:27-42)
  * SigLoss (AdaBins scale-invariant log loss - reference: sigloss.py:36-57)
  * DDIM term passes through ``output['ddim_loss']`` computed inside the head.

All functions are pure; masking uses static shapes (no boolean gather).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax.numpy as jnp

T_VALID = 1e-4


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, max_depth: float) -> jnp.ndarray:
    """Reference l1loss.py:27-42 - per-sample masked mean, summed over batch."""
    gt_c = jnp.clip(gt, 0.0, max_depth).astype(jnp.float32)
    pred_c = jnp.clip(pred, 0.0, max_depth).astype(jnp.float32)
    mask = (gt_c > T_VALID).astype(jnp.float32)
    d = jnp.abs(pred_c - gt_c) * mask
    axes = tuple(range(1, gt_c.ndim))
    per = jnp.sum(d, axis=axes) / (jnp.sum(mask, axis=axes) + 1e-8)
    return jnp.sum(per)


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray, max_depth: float) -> jnp.ndarray:
    """Reference l2loss.py:27-42."""
    gt_c = jnp.clip(gt, 0.0, max_depth).astype(jnp.float32)
    pred_c = jnp.clip(pred, 0.0, max_depth).astype(jnp.float32)
    mask = (gt_c > T_VALID).astype(jnp.float32)
    d = jnp.square(pred_c - gt_c) * mask
    axes = tuple(range(1, gt_c.ndim))
    per = jnp.sum(d, axis=axes) / (jnp.sum(mask, axis=axes) + 1e-8)
    return jnp.sum(per)


def sig_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    max_depth: Optional[float] = None,
    loss_weight: float = 2.0,
    eps: float = 0.001,
) -> jnp.ndarray:
    """AdaBins scale-invariant log loss (reference sigloss.py:36-57), masked
    form with static shapes: Dg = var(g) + 0.15*mean(g)^2 over valid pixels."""
    pred = pred.astype(jnp.float32)
    gt = gt.astype(jnp.float32)
    mask = gt > 0
    if max_depth is not None:
        mask = jnp.logical_and(mask, gt <= max_depth)
    m = mask.astype(jnp.float32)
    n = jnp.sum(m) + 1e-8
    g = (jnp.log(jnp.clip(pred, 0.0, None) + eps) - jnp.log(jnp.clip(gt, 0.0, None) + eps)) * m
    mean_g = jnp.sum(g) / n
    # torch.var defaults to the unbiased (n-1) estimator
    var_g = jnp.sum(jnp.square(g - mean_g * m)) / jnp.clip(n - 1.0, 1.0, None)
    dg = var_g + 0.15 * jnp.square(mean_g)
    return loss_weight * jnp.sqrt(dg)


class LossComputer:
    """Parses the loss spec and computes ``(loss_sum, loss_val)``.

    ``loss_val`` is a (1, n_terms+1) row of detached per-term values with the
    total appended, matching the reference summary contract
    (diffusion_dcbase_loss.py:42-49).
    """

    def __init__(self, args):
        self.args = args
        self.terms: List[Tuple[str, float]] = []
        for loss_item in args.loss.split("+"):
            weight, loss_type = loss_item.split("*")
            self.terms.append((loss_type, float(weight)))
        self.loss_name = [t for t, _ in self.terms]

    def __call__(self, sample: Dict, output: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.compute(sample, output)

    def compute(self, sample: Dict, output: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        pred = output["pred"]
        gt = sample["gt"]
        vals = []
        for loss_type, weight in self.terms:
            if loss_type == "L1":
                v = l1_loss(pred, gt, self.args.max_depth)
            elif loss_type == "L2":
                v = l2_loss(pred, gt, self.args.max_depth)
            elif loss_type == "Sig":
                v = sig_loss(pred, gt)
            elif loss_type == "DDIM":
                v = output["ddim_loss"]
                if v is None:
                    v = jnp.zeros(())
            elif loss_type == "BIN":
                v = sum(output["bin_losses"].values())
            else:
                raise NotImplementedError(loss_type)
            vals.append(weight * v)
        loss_vec = jnp.stack(vals)
        loss_sum = jnp.sum(loss_vec)
        loss_val = jnp.concatenate([loss_vec, loss_sum[None]])[None]
        return loss_sum, loss_val


def get_loss_names(args) -> List[str]:
    """Term names + 'Total', matching the loss_val row layout
    (reference diffusion_dcbase_loss.py:42-49 / summary loss_name)."""
    return [item.split("*")[1] for item in args.loss.split("+")] + ["Total"]


def get_loss(args) -> Callable:
    """Reference-style factory (src/loss/__init__.py:25-30): resolves by
    ``args.model_name`` - both NLSPN and Diffusion_DCbase_ use the same
    masked L1/L2 machinery."""
    return lambda a=args: LossComputer(a)
