"""Optimizer / LR-schedule factory.

Re-implements the reference's ``make_optimizer_scheduler[_split]``
(src/utility.py:50-130) in optax:

  * SGD(momentum) / Adam(betas, eps) / RMSprop(eps), weight decay applied as
    L2-into-gradient (torch convention, not decoupled AdamW)
  * LambdaLR with the LRFactor piecewise-constant table (utility.py:22-33):
    during (1-based) epoch e the factor is ``factor(e-1)`` because torch's
    scheduler.step() runs at epoch end
  * linear warm-up over epoch 1: lr = base * step/(steps_per_epoch+1)
    (reference src/main.py:216-222, cnt incremented before use)
  * split-backbone mode: backbone params at 0.1x lr (utility.py:87-130)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config import Config, convert_str_to_num


def lr_factor(epoch_0based, decay, gamma):
    """LRFactor.get_factor (reference utility.py:29-33), traced-friendly."""
    factor = jnp.asarray(gamma[-1], jnp.float32)
    # iterate in reverse so the FIRST matching boundary wins
    for d, g in reversed(list(zip(decay, gamma))):
        factor = jnp.where(epoch_0based < d, g, factor)
    return factor


def make_lr_schedule(cfg: Config, steps_per_epoch: int) -> Callable:
    """Global-step -> lr, reproducing warmup + LambdaLR composition."""
    decay = convert_str_to_num(cfg.decay, "int")
    gamma = convert_str_to_num(cfg.gamma, "float")
    assert len(decay) == len(gamma), "decay and gamma must have same length"
    base_lr = cfg.lr
    warm = cfg.warm_up

    def schedule(count):
        count = jnp.asarray(count)
        epoch_1based = count // steps_per_epoch + 1
        step_in_epoch = count % steps_per_epoch
        factor = lr_factor(epoch_1based - 1, decay, gamma)
        lr = base_lr * factor
        if warm:
            warm_lr = base_lr * (step_in_epoch + 1.0) / (steps_per_epoch + 1.0)
            lr = jnp.where(epoch_1based == 1, warm_lr, lr)
        return lr

    return schedule


def _core_transform(cfg: Config) -> optax.GradientTransformation:
    parts = []
    if cfg.weight_decay:
        parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.optimizer == "SGD":
        parts.append(optax.trace(decay=cfg.momentum))
    elif cfg.optimizer == "ADAM":
        parts.append(
            optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.epsilon)
        )
    elif cfg.optimizer == "RMSprop":
        parts.append(optax.scale_by_rms(eps=cfg.epsilon))
    else:
        raise NotImplementedError(cfg.optimizer)
    return optax.chain(*parts)


def make_optimizer(
    cfg: Config,
    steps_per_epoch: int,
    params=None,
) -> optax.GradientTransformation:
    """Full optimizer. With ``cfg.split_backbone_training`` and ``params``
    given, backbone parameters ('depth_backbone' subtree) train at 0.1x lr."""
    schedule = make_lr_schedule(cfg, steps_per_epoch)
    core = _core_transform(cfg)

    if not (cfg.split_backbone_training and params is not None):
        return optax.chain(core, optax.scale_by_learning_rate(schedule))

    def label_fn(p):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: "backbone"
            if any(getattr(k, "key", None) == "depth_backbone" for k in path)
            else "base",
            p,
        )

    backbone_schedule = lambda c: 0.1 * schedule(c)
    return optax.multi_transform(
        {
            "base": optax.chain(core, optax.scale_by_learning_rate(schedule)),
            "backbone": optax.chain(
                core, optax.scale_by_learning_rate(backbone_schedule)
            ),
        },
        label_fn(params),
    )
