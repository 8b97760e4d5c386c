"""Jitted train / eval step factories.

One jitted function per phase (reference equivalent: the per-batch body of
``train(gpu, args)``, src/main.py:204-245, and ``test(args)``,
src/main.py:456-474). Loss normalisation reproduces the reference's
DDP semantics exactly: per-sample masked means are summed over the batch and
divided by the batch size (src/main.py:235-236), which after DDP gradient
averaging equals the global-batch mean - so here we divide the global-batch
sum by the global batch size.

Sharding: batches arrive sharded over the mesh 'data' axis; params/opt state
are replicated. GSPMD inserts the gradient all-reduce (the NCCL DDP
equivalent) and the BatchNorm cross-replica statistics reductions.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..losses import LossComputer
from ..metrics import evaluate_depth_metrics
from .train_state import TrainState


def make_train_step(
    model,
    loss_computer: LossComputer,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    state_shardings=None,
) -> Callable:
    """Returns ``train_step(state, batch, rng) -> (state, loss, loss_val)``.

    ``state_shardings`` (from ``parallel.state_sharding``) enables tensor
    parallelism: parameters sharded on the mesh 'model' axis stay sharded
    through the update; None keeps the pure data-parallel (replicated-params)
    layout."""

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        batch_size = batch["rgb"].shape[0]
        diff_rng, drop_rng = jax.random.split(rng)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch,
                train=True,
                rngs={"diffusion": diff_rng, "dropout": drop_rng},
                mutable=["batch_stats"],
            )
            loss_sum, loss_val = loss_computer(batch, out)
            # reference: loss_sum / loader.batch_size (src/main.py:235)
            loss_sum = loss_sum / batch_size
            loss_val = loss_val / batch_size
            return loss_sum, (mutated["batch_stats"], loss_val, out)

        (loss, (new_bs, loss_val, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        metric_val = evaluate_depth_metrics(batch, out)
        return new_state, loss, loss_val, metric_val

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        state_sh = state_shardings if state_shardings is not None else repl
        return jax.jit(
            train_step,
            in_shardings=(state_sh, data, repl),
            out_shardings=(state_sh, repl, repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def _hflip_batch(batch: Dict) -> Dict:
    """Mirror all image-like entries along W (the TTA flip; intrinsics K are
    unused by the network so no principal-point fix is needed on-device)."""
    return {
        k: (jnp.flip(v, axis=2) if hasattr(v, "ndim") and v.ndim == 4 else v)
        for k, v in batch.items()
    }


def make_eval_step(
    model, mesh: Optional[Mesh] = None, tta_flip: bool = False
) -> Callable:
    """Returns ``eval_step(state, batch, rng) -> (pred, metric_row)``.

    Uses running BN statistics (train=False) and skips the ddim-loss denoiser
    call the reference wastefully makes at test time
    (ddim_depth_estimate_res_swin_addHAHI.py:165).

    ``tta_flip=True`` is the leaderboard protocol's flip-ensemble
    (BASELINE.json config #5): the batch and its horizontal mirror run as one
    doubled batch (so the ensemble shards over the mesh data axis like any
    other batch) and predictions are averaged after unflipping.
    """

    def eval_step(state: TrainState, batch: Dict, rng: jax.Array):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if tta_flip:
            b = batch["rgb"].shape[0]
            flipped = _hflip_batch(batch)
            both = {
                k: (jnp.concatenate([batch[k], flipped[k]], axis=0)
                    if hasattr(batch[k], "ndim") and batch[k].ndim >= 1 else batch[k])
                for k in batch
            }
            out = model.apply(
                variables, both, train=False, rngs={"diffusion": rng}
            )
            pred = 0.5 * (
                out["pred"][:b] + jnp.flip(out["pred"][b:], axis=2)
            )
            out = dict(out, pred=pred)
        else:
            out = model.apply(
                variables, batch, train=False, rngs={"diffusion": rng}
            )
        metric_val = evaluate_depth_metrics(batch, out)
        return out["pred"], metric_val

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            eval_step,
            in_shardings=(repl, data, repl),
            out_shardings=(data, repl),
        )
    return jax.jit(eval_step)
