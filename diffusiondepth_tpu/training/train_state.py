"""Train state: params + batch_stats + optimizer state + step counter.

Replaces the reference's scattered (net, optimizer, scheduler, amp) quadruple
(src/main.py:102-148) with one immutable pytree that jits, shards, and
checkpoints as a unit.
"""

from __future__ import annotations

from typing import Any

import jax
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
            opt_state=new_opt_state,
        )


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    sample,
    rng: jax.Array,
    train: bool = False,
) -> TrainState:
    params_rng, diff_rng = jax.random.split(rng)
    variables = model.init(
        {"params": params_rng, "diffusion": diff_rng}, sample, train=train
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jax.numpy.zeros((), jax.numpy.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
