"""Checkpoint save / restore.

Reference behaviour (src/main.py:269-283, 43-66, 107-144):
  * per-epoch rank0 save named ``model_{epoch:05d}`` - always {net, args},
    plus optimizer/scheduler state when ``--save_full`` or final epoch
  * resume restores args FROM the checkpoint (overriding all but a few
    flags), then weights, then optimizer state
  * an ``args.json`` snapshot in the save dir (src/main.py:172-173)

TPU-native form: one msgpack file per epoch holding
``{params, batch_stats, opt_state?, step, args}`` via flax.serialization -
a single immutable pytree that round-trips bit-exactly and loads on any
device topology (values are numpy; sharding is applied on restore by the
caller's jit). Orbax is avoidable here because states are modest (<2 GB).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np
from flax import serialization

from ..config import Config


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(
    save_dir: str,
    epoch: int,
    state,
    args: Config,
    save_full: bool = False,
) -> str:
    """Write ``{save_dir}/model_{epoch:05d}.ckpt`` (reference naming,
    src/main.py:276). Returns the path."""
    os.makedirs(save_dir, exist_ok=True)
    # to_state_dict turns tuples/namedtuples (optax chain states) into
    # msgpack-safe nested dicts
    payload: Dict[str, Any] = {
        "params": serialization.to_state_dict(_to_numpy(state.params)),
        "batch_stats": serialization.to_state_dict(_to_numpy(state.batch_stats)),
        "step": int(state.step),
        "epoch": int(epoch),
    }
    if save_full:
        payload["opt_state"] = serialization.to_state_dict(
            _to_numpy(state.opt_state)
        )
    path = os.path.join(save_dir, f"model_{epoch:05d}.ckpt")
    blob = serialization.msgpack_serialize(payload)
    with open(path, "wb") as f:
        f.write(blob)
    with open(os.path.join(save_dir, f"model_{epoch:05d}.args.json"), "w") as f:
        json.dump(args.to_dict(), f, indent=2, default=str)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Read a checkpoint written by ``save_checkpoint``. Returns the payload
    dict; ``args`` (if the sibling json exists) is attached as a Config."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    args_path = path.replace(".ckpt", ".args.json")
    if os.path.exists(args_path):
        with open(args_path) as f:
            payload["args"] = Config.from_dict(json.load(f))
    return payload


def apply_checkpoint_args(ckpt_args: Config, cli_args: Config) -> Config:
    """Resume semantics (reference check_args, src/main.py:54-64): args come
    from the checkpoint, with test_only / pretrain / dir_data / resume /
    (force_maxdepth -> max_depth) kept from the CLI."""
    new = Config.from_dict(ckpt_args.to_dict())
    new.test_only = cli_args.test_only
    new.pretrain = cli_args.pretrain
    new.dir_data = cli_args.dir_data
    new.resume = cli_args.resume
    new.save_dir = cli_args.save_dir
    if cli_args.force_maxdepth:
        new.max_depth = cli_args.max_depth
    return new


def restore_state(state, payload, strict: bool = True):
    """Rebuild a TrainState from a checkpoint payload (weights, batch_stats,
    and opt_state when present - reference src/main.py:107-144)."""
    params = serialization.from_state_dict(state.params, payload["params"])
    batch_stats = serialization.from_state_dict(
        state.batch_stats, payload["batch_stats"]
    )
    new = state.replace(
        params=params,
        batch_stats=batch_stats,
        step=jax.numpy.asarray(payload.get("step", 0), jax.numpy.int32),
    )
    if "opt_state" in payload:
        new = new.replace(
            opt_state=serialization.from_state_dict(
                state.opt_state, payload["opt_state"]
            )
        )
    return new
