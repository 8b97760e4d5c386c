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
    accum_steps: int = 1,
) -> Callable:
    """Returns ``train_step(state, batch, rng) -> (state, loss, loss_val)``.

    ``state_shardings`` (from ``parallel.state_sharding``) enables tensor
    parallelism: parameters sharded on the mesh 'model' axis stay sharded
    through the update; None keeps the pure data-parallel (replicated-params)
    layout.

    ``accum_steps`` > 1 splits the batch into that many micro-batches and
    runs them as a ``lax.scan`` that accumulates gradients before the single
    optimizer update, so live activation memory is bounded by one micro-batch.
    This is how the reference's global batch 8 (README.md:212-215) trains on
    one v5e chip: the flagship at bs 8 overflows HBM by ~234 MB, bs 4 x 2
    accumulation fits. Semantics match large-batch training up to BatchNorm:
    batch statistics are computed per micro-batch and the running stats are
    threaded sequentially through the scan - the same behaviour as the
    reference's per-GPU batches under DDP (each GPU normalises with its own
    micro-batch when syncBN is off)."""

    def accum_train_step(state: TrainState, batch: Dict, rng: jax.Array):
        batch_size = batch["rgb"].shape[0]
        micro = {
            k: v.reshape((accum_steps, batch_size // accum_steps) + v.shape[1:])
            for k, v in batch.items()
        }
        step_rngs = jax.random.split(rng, accum_steps)
        n_terms = len(loss_computer.loss_name) + 1

        def micro_loss(params, batch_stats, mb, r):
            diff_rng, drop_rng = jax.random.split(r)
            out, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                mb,
                train=True,
                rngs={"diffusion": diff_rng, "dropout": drop_rng},
                mutable=["batch_stats"],
            )
            loss_sum, loss_val = loss_computer(mb, out)
            return loss_sum, (mutated["batch_stats"], loss_val, out["pred"])

        grad_fn = jax.value_and_grad(micro_loss, has_aux=True)

        def body(carry, xs):
            bs, g_acc, l_acc, lv_acc = carry
            mb, r = xs
            (l_sum, (new_bs, lval, pred)), g = grad_fn(state.params, bs, mb, r)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            return (new_bs, g_acc, l_acc + l_sum, lv_acc + lval), pred

        init = (
            state.batch_stats,
            jax.tree_util.tree_map(jnp.zeros_like, state.params),
            jnp.zeros((), jnp.float32),
            jnp.zeros((1, n_terms), jnp.float32),
        )
        (new_bs, grads, loss_sum, loss_val), preds = jax.lax.scan(
            body, init, (micro, step_rngs)
        )
        # reference normalisation: summed loss / global batch (src/main.py:235)
        grads = jax.tree_util.tree_map(lambda g: g / batch_size, grads)
        loss = loss_sum / batch_size
        loss_val = loss_val / batch_size
        new_state = state.apply_gradients(grads, new_batch_stats=new_bs)
        pred = preds.reshape((batch_size,) + preds.shape[2:])
        metric_val = evaluate_depth_metrics(batch, {"pred": pred})
        return new_state, loss, loss_val, metric_val

    def plain_train_step(state: TrainState, batch: Dict, rng: jax.Array):
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

    train_step = accum_train_step if accum_steps > 1 else plain_train_step

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
    model, mesh: Optional[Mesh] = None, tta_flip: bool = False,
    extra_keys=(),
) -> Callable:
    """Returns ``eval_step(state, batch, rng) -> (pred, metric_row, extras)``.

    Uses running BN statistics (train=False) and skips the ddim-loss denoiser
    call the reference wastefully makes at test time
    (ddim_depth_estimate_res_swin_addHAHI.py:165).

    ``tta_flip=True`` is the leaderboard protocol's flip-ensemble
    (BASELINE.json config #5): the batch and its horizontal mirror run as one
    doubled batch (so the ensemble shards over the mesh data axis like any
    other batch) and predictions are averaged after unflipping.

    ``extra_keys`` selects additional output-dict entries (e.g. NLSPN's
    guidance/offset/aff/gamma for its summary panels, reference
    nlspnsummary.py:185-188) returned as the third element; keys absent or
    None in the model output are silently dropped.
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
        extras = {k: out[k] for k in extra_keys
                  if out.get(k, None) is not None}
        return out["pred"], metric_val, extras

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(
            eval_step,
            in_shardings=(repl, data, repl),
            out_shardings=(data, repl, repl),
        )
    return jax.jit(eval_step)
