"""Training / evaluation entry point.

The reference runtime (src/main.py) spawns one process per GPU, wires NCCL
DDP, and runs nested python loops with per-batch host<->device traffic. Here
the whole runtime is single-controller JAX:

  * one ``Mesh`` over all local devices; batches sharded on the 'data' axis,
    parameters replicated - GSPMD emits the gradient all-reduce (the DDP
    equivalent, reference src/main.py:148) and cross-replica BatchNorm stats
    (the apex syncBN equivalent, :128)
  * ONE jitted train step (training/steps.py) and ONE jitted eval step; the
    20-step DDIM sampler is a lax.scan inside them - no per-step host math
    (the reference syncs the host every diffusion step,
    ddim_depth_estimate_res_swin_addHAHI.py:291)
  * epoch loop: train -> val -> test, checkpoint per epoch, text/image
    summaries - mirroring train(gpu, args) (src/main.py:69-401)
  * ``test``: full-split eval with per-frame timing matching the reference's
    "Average processing time" report (src/main.py:489-491)

Run:  python -m diffusiondepth_tpu.main --data_name KITTIDC ...
"""

from __future__ import annotations

import os
import time
from typing import Dict

import jax
import numpy as np

from .config import Config, parse_args
from .data import DataLoader, get as get_data
from .losses import LossComputer
from .models import build_model
from .parallel.mesh import create_mesh, process_info, shard_batch
from .summary import get as get_summary
from .training.optim import make_optimizer
from .training.steps import make_eval_step, make_train_step
from .training.train_state import create_train_state
from .utils.checkpoint import (
    apply_checkpoint_args,
    load_checkpoint,
    restore_state,
    save_checkpoint,
)
from .utils.misc import backup_source_code


def check_args(args: Config) -> Config:
    """Resume override (reference check_args, src/main.py:43-66)."""
    if args.pretrain and args.resume:
        assert os.path.exists(args.pretrain), f"missing checkpoint {args.pretrain}"
        ckpt = load_checkpoint(args.pretrain)
        if "args" in ckpt:
            args = apply_checkpoint_args(ckpt["args"], args)
    return args


def _build_state(cfg: Config, dataset_len: int, rng):
    model = build_model(cfg)
    steps_per_epoch = max(1, dataset_len // cfg.batch_size)
    sample = _dummy_batch(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    state = create_train_state(model, tx, sample, rng)
    return model, state, steps_per_epoch


def _dummy_batch(cfg: Config, batch: int = 1) -> Dict[str, np.ndarray]:
    h, w = cfg.patch_height, cfg.patch_width
    z = np.zeros((batch, h, w, 1), np.float32)
    return {
        "rgb": np.zeros((batch, h, w, 3), np.float32),
        "dep": z,
        "gt": z + 1.0,
        "K": np.zeros((batch, 4), np.float32),
        "depth_mask": z,
        "depth_map": z,
    }


def _device_batch(batch, mesh):
    batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    return shard_batch(batch, mesh)


def train(args: Config):
    cfg = check_args(args)
    os.makedirs(cfg.save_dir, exist_ok=True)
    cfg.save_json(os.path.join(cfg.save_dir, "args.json"))
    try:
        backup_source_code(os.path.join(cfg.save_dir, "code"))
    except OSError as e:
        print(f"[warn] source backup failed: {e}")

    mesh = create_mesh(cfg.mesh_shape)
    print(f"devices: {jax.device_count()} | mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    hosts = process_info()

    data_cls = get_data(cfg)
    ds_train = data_cls(cfg, "train")
    ds_val = data_cls(cfg, "val")
    ds_test = data_cls(cfg, "test")

    loader_train = DataLoader(
        ds_train, cfg.batch_size, shuffle=True, drop_last=True,
        num_threads=max(cfg.num_threads, 1), prefetch=cfg.prefetch, seed=cfg.seed,
        **hosts,
    )
    loader_val = DataLoader(
        ds_val, cfg.test_batch_size, shuffle=False, num_threads=2, seed=cfg.seed,
        **hosts,
    )
    loader_test = DataLoader(
        ds_test, cfg.test_batch_size, shuffle=False, num_threads=2, seed=cfg.seed,
        **hosts,
    )

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    model, state, steps_per_epoch = _build_state(cfg, len(ds_train), init_rng)

    if cfg.pretrain:
        ckpt = load_checkpoint(cfg.pretrain)
        state = restore_state(state, ckpt)
        print(f"loaded checkpoint {cfg.pretrain} (epoch {ckpt.get('epoch', '?')})")

    if cfg.accum_steps > 1 and cfg.batch_size % cfg.accum_steps:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by accum_steps "
            f"{cfg.accum_steps}"
        )
    loss_computer = LossComputer(cfg)
    train_step = make_train_step(
        model, loss_computer, mesh=mesh, accum_steps=cfg.accum_steps
    )
    summary_cls = get_summary(cfg)
    eval_step = make_eval_step(
        model, mesh=mesh, extra_keys=getattr(summary_cls, "SAVE_KEYS", ())
    )

    writer_train = summary_cls(cfg.save_dir, "train", cfg)
    writer_val = summary_cls(cfg.save_dir, "val", cfg)
    writer_test = summary_cls(cfg.save_dir, "test", cfg)

    start_epoch = 1
    if cfg.resume and cfg.pretrain:
        start_epoch = int(load_checkpoint(cfg.pretrain).get("epoch", 0)) + 1

    for epoch in range(start_epoch, cfg.epochs + 1):
        # ---- train ----
        loader_train.set_epoch(epoch)
        t0 = time.time()
        for i, batch in enumerate(loader_train):
            # profiler window: steps 10-15 of the first epoch
            # (reference has no tracing at all, SURVEY.md section 5)
            if cfg.profile_dir and epoch == start_epoch and i == 10:
                jax.profiler.start_trace(cfg.profile_dir)
            rng, step_rng = jax.random.split(rng)
            dbatch = _device_batch(batch, mesh)
            state, loss, loss_val, metric_val = train_step(state, dbatch, step_rng)
            writer_train.add(loss=np.asarray(loss_val), metric=np.asarray(metric_val))
            if cfg.profile_dir and epoch == start_epoch and i == 15:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                try:  # device-time breakdown, inline (tools/analyze_trace.py)
                    from .tools.analyze_trace import find_trace_file, summarize

                    print(summarize(find_trace_file(cfg.profile_dir), top=20))
                except Exception as e:  # the trace itself is still on disk
                    print(f"(trace written; summary failed: {e})")
            if i % cfg.log_every == 0:
                print(
                    f"epoch {epoch} step {i}/{steps_per_epoch} "
                    f"loss {float(loss):.4f} ({time.time() - t0:.1f}s)"
                )
        writer_train.update(epoch, None, None)

        # ---- checkpoint (reference: per-epoch rank0 save, src/main.py:269-283)
        save_full = cfg.save_full or epoch == cfg.epochs
        path = save_checkpoint(cfg.save_dir, epoch, state, cfg, save_full=save_full)
        print(f"saved {path}")

        # ---- val ----
        rng_eval = jax.random.PRNGKey(cfg.seed + epoch)
        last = None
        for i, batch in enumerate(loader_val):
            rng_eval, e_rng = jax.random.split(rng_eval)
            dbatch = _device_batch(batch, mesh)
            pred, metric_val, extras = eval_step(state, dbatch, e_rng)
            writer_val.add(metric=np.asarray(metric_val))
            last = (batch, {"pred": np.asarray(pred),
                            **{k: np.asarray(v) for k, v in extras.items()}})
        writer_val.update(epoch, *(last or (None, None)))

        # ---- inline test (reference runs train -> val -> test every epoch,
        # src/main.py:343-395; its epoch-wise metric_test.txt trace -
        # experiments/swinkitti/test.txt - is the primary empirical record)
        last = None
        for i, batch in enumerate(loader_test):
            rng_eval, e_rng = jax.random.split(rng_eval)
            dbatch = _device_batch(batch, mesh)
            pred, metric_val, extras = eval_step(state, dbatch, e_rng)
            writer_test.add(metric=np.asarray(metric_val))
            last = (batch, {"pred": np.asarray(pred),
                            **{k: np.asarray(v) for k, v in extras.items()}})
        writer_test.update(epoch, *(last or (None, None)))

    return state


def test(args: Config):
    """Single-split evaluation with per-frame timing
    (reference test(), src/main.py:404-491)."""
    cfg = check_args(args)
    os.makedirs(cfg.save_dir, exist_ok=True)

    mesh = create_mesh(cfg.mesh_shape)
    data_cls = get_data(cfg)
    ds_test = data_cls(cfg, "test")
    loader = DataLoader(ds_test, cfg.test_batch_size, shuffle=False,
                        num_threads=2, seed=cfg.seed)

    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    model, state, _ = _build_state(cfg, max(1, len(ds_test)), init_rng)
    if cfg.pretrain:
        ckpt = load_checkpoint(cfg.pretrain)
        state = restore_state(state, ckpt)
        print(f"loaded checkpoint {cfg.pretrain}")

    summary_cls = get_summary(cfg)
    eval_step = make_eval_step(
        model, mesh=mesh, tta_flip=cfg.tta_flip,
        extra_keys=getattr(summary_cls, "SAVE_KEYS", ()),
    )
    writer = summary_cls(cfg.save_dir, "test", cfg)

    t_total, n, n_seen = 0.0, 0, 0
    for i, batch in enumerate(loader):
        rng, e_rng = jax.random.split(rng)
        dbatch = _device_batch(batch, mesh)
        bsz = batch["rgb"].shape[0]
        t0 = time.time()
        pred, metric_val, extras = eval_step(state, dbatch, e_rng)
        pred = jax.block_until_ready(pred)
        t1 = time.time()
        # timed region excludes compiles: batch 0 AND any ragged final batch
        # (a new batch shape retraces; the reference's i>0 skip was not enough
        # when len(split) % test_batch_size != 0)
        if i > 0 and bsz == cfg.test_batch_size:
            t_total += t1 - t0
            n += bsz
        writer.add(metric=np.asarray(metric_val))
        if cfg.save_image:
            # save() wants the dataset index of the batch's first sample
            writer.save(0, n_seen, batch,
                        {"pred": np.asarray(pred),
                         **{k: np.asarray(v) for k, v in extras.items()}})
        n_seen += bsz
    writer.update(0, None, None)
    if n:
        print(f"elapsed time : {t_total:.4f} sec, "
              f"Average processing time : {t_total / n:.4f} sec")
    return state


def main(args: Config):
    if args.test_only:
        test(args)
    else:
        state = train(args)
    print("done")


if __name__ == "__main__":
    main(parse_args())
