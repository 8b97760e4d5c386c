"""Multi-device (8 virtual CPU) data-parallel training tests and optimizer
schedule parity (reference semantics: src/utility.py LRFactor + warmup
src/main.py:216-222; DDP loss normalisation src/main.py:235)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.losses import LossComputer
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.parallel import create_mesh, shard_batch
from diffusiondepth_tpu.training import (
    create_train_state,
    make_eval_step,
    make_lr_schedule,
    make_optimizer,
    make_train_step,
)


def _cfg(**kw):
    base = dict(
        model_name="Diffusion_DCbase_",
        backbone_name="mmbev_res18",
        head_specify="DDIMDepthEstimate_Res",
        inference_steps=2,
        batch_size=8,
        max_depth=10.0,
    )
    base.update(kw)
    return Config(**base).finalize()


def _batch(b=8, h=32, w=48, seed=0):
    rng = np.random.RandomState(seed)
    gt = np.clip(rng.rand(b, h, w, 1) * 8 + 1, 0, 10).astype(np.float32)
    return {
        "rgb": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "dep": jnp.asarray(gt),
        "gt": jnp.asarray(gt),
        "depth_map": jnp.asarray(gt),
        "depth_mask": jnp.ones((b, h, w, 1), jnp.float32),
    }


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8


def test_lr_schedule_matches_reference_lambdalr():
    cfg = _cfg(lr=0.001, decay="10,15,20", gamma="1.0,0.2,0.04", warm_up=False)
    sched = make_lr_schedule(cfg, steps_per_epoch=100)
    # during epoch e (1-based), factor(e-1) applies (scheduler.step at epoch end)
    assert np.isclose(float(sched(0)), 0.001)  # epoch 1 -> factor(0)=1.0
    assert np.isclose(float(sched(100 * 9)), 0.001)  # epoch 10 -> factor(9)=1.0
    assert np.isclose(float(sched(100 * 10)), 0.0002)  # epoch 11 -> factor(10)=0.2
    assert np.isclose(float(sched(100 * 15)), 0.00004)  # epoch 16 -> factor(15)=0.04
    assert np.isclose(float(sched(100 * 25)), 0.00004)  # beyond table -> last gamma


def test_lr_warmup_epoch_one():
    cfg = _cfg(lr=0.001, warm_up=True)
    sched = make_lr_schedule(cfg, steps_per_epoch=10)
    # reference: cnt incremented before use -> step k has lr base*(k+1)/(n+1)
    assert np.isclose(float(sched(0)), 0.001 * 1 / 11)
    assert np.isclose(float(sched(9)), 0.001 * 10 / 11)
    assert np.isclose(float(sched(10)), 0.001)  # epoch 2: full lr


@pytest.mark.slow
def test_data_parallel_train_step_runs_and_matches_single_device():
    """One sharded train step over the 8-device mesh; loss must equal the
    single-device computation on the identical global batch."""
    cfg = _cfg()
    model = build_model(cfg)
    lc = LossComputer(cfg)
    batch = _batch(b=8)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    mesh = create_mesh()
    step_sharded = make_train_step(model, lc, mesh=mesh, donate=False)
    step_single = make_train_step(model, lc, mesh=None, donate=False)

    rng = jax.random.PRNGKey(1)
    s1, loss1, lv1, mv1 = step_sharded(state, shard_batch(batch, mesh), rng)
    s2, loss2, lv2, mv2 = step_single(state, batch, rng)

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(lv1), np.asarray(lv2), rtol=2e-4, atol=1e-5)
    # params updated near-identically (data-parallel == single-device global
    # batch; atol covers adam sign flips on near-zero grads from differing
    # reduction orders - first-step |update| is ~lr)
    p1 = jax.tree_util.tree_leaves(s1.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=3e-4)


@pytest.mark.slow
def test_gradient_accumulation_matches_manual_micro_batches():
    """accum_steps=2 must equal: forward/backward each half sequentially
    (threading BatchNorm batch_stats), sum the gradients, divide by the
    GLOBAL batch size, one optimizer update - the semantics that let the
    reference's global bs 8 (README.md:212-215) train on one chip."""
    cfg = _cfg(accum_steps=2)
    model = build_model(cfg)
    lc = LossComputer(cfg)
    batch = _batch(b=8)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    step = make_train_step(model, lc, donate=False, accum_steps=2)
    rng = jax.random.PRNGKey(1)
    s_acc, loss_acc, lv_acc, mv_acc = step(state, batch, rng)

    # manual reference computation
    halves = [
        {k: v[:4] for k, v in batch.items()},
        {k: v[4:] for k, v in batch.items()},
    ]
    rngs = jax.random.split(rng, 2)

    def loss_fn(params, bs, mb, r):
        diff_rng, drop_rng = jax.random.split(r)
        out, mutated = model.apply(
            {"params": params, "batch_stats": bs}, mb, train=True,
            rngs={"diffusion": diff_rng, "dropout": drop_rng},
            mutable=["batch_stats"],
        )
        loss_sum, _ = lc(mb, out)
        return loss_sum, mutated["batch_stats"]

    grad_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    bs = state.batch_stats
    grads, total = None, 0.0
    for mb, r in zip(halves, rngs):
        (l, bs), g = grad_fn(state.params, bs, mb, r)
        total += float(l)
        grads = g if grads is None else jax.tree_util.tree_map(jnp.add, grads, g)
    grads = jax.tree_util.tree_map(lambda g: g / 8.0, grads)
    s_ref = state.apply_gradients(grads, new_batch_stats=bs)

    np.testing.assert_allclose(float(loss_acc), total / 8.0, rtol=1e-5)
    # atol: scan-vs-sequential float reassociation amplified through adam's
    # rsqrt (same rationale as the DP-equality test above)
    for p1, p2 in zip(
        jax.tree_util.tree_leaves(s_acc.params),
        jax.tree_util.tree_leaves(s_ref.params),
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)
    for b1, b2 in zip(
        jax.tree_util.tree_leaves(s_acc.batch_stats),
        jax.tree_util.tree_leaves(s_ref.batch_stats),
    ):
        np.testing.assert_allclose(np.asarray(b1), np.asarray(b2), rtol=1e-5,
                                   atol=1e-6)
    assert np.isfinite(np.asarray(mv_acc)).all()


@pytest.mark.slow
def test_gradient_accumulation_sharded():
    """accum under the 8-device data-parallel mesh: each micro-batch still
    shards over 'data'; loss matches the unsharded accumulation."""
    cfg = _cfg(accum_steps=2)
    model = build_model(cfg)
    lc = LossComputer(cfg)
    batch = _batch(b=8)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    rng = jax.random.PRNGKey(1)

    step1 = make_train_step(model, lc, donate=False, accum_steps=2)
    _, loss1, _, _ = step1(state, batch, rng)
    mesh = create_mesh()
    step8 = make_train_step(model, lc, mesh=mesh, donate=False, accum_steps=2)
    _, loss8, _, _ = step8(state, shard_batch(batch, mesh), rng)
    np.testing.assert_allclose(float(loss8), float(loss1), rtol=2e-4)


def test_eval_step_sharded():
    cfg = _cfg()
    model = build_model(cfg)
    batch = _batch(b=8)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    mesh = create_mesh()
    eval_step = make_eval_step(model, mesh=mesh)
    pred, metrics, _ = eval_step(state, shard_batch(batch, mesh), jax.random.PRNGKey(2))
    assert pred.shape == batch["gt"].shape
    assert np.isfinite(np.asarray(metrics)).all()


@pytest.mark.slow
def test_graft_entry_dryrun():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.shape[-1] == 1
    ge.dryrun_multichip(8)


def test_split_backbone_training_lr():
    cfg = _cfg(split_backbone_training=True, warm_up=False)
    model = build_model(cfg)
    batch = _batch(b=2)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "diffusion": jax.random.PRNGKey(1)},
        batch, train=False,
    )
    tx = make_optimizer(cfg, steps_per_epoch=10, params=variables["params"])
    opt_state = tx.init(variables["params"])
    grads = jax.tree_util.tree_map(jnp.ones_like, variables["params"])
    updates, _ = tx.update(grads, opt_state, variables["params"])
    # backbone updates should be 0.1x of head updates for identical unit grads
    # (compare adam first-step magnitudes: |update| = lr for unit grad)
    head_leaf = np.abs(np.asarray(
        jax.tree_util.tree_leaves(updates["depth_head"])[0])).max()
    bb_leaf = np.abs(np.asarray(
        jax.tree_util.tree_leaves(updates["depth_backbone"])[0])).max()
    np.testing.assert_allclose(bb_leaf, 0.1 * head_leaf, rtol=1e-3)


@pytest.mark.slow
def test_tensor_parallel_2d_mesh_step():
    """data:4,model:2 mesh: large params shard over 'model', batch over
    'data'; one train step runs and matches the data-parallel loss."""
    from diffusiondepth_tpu.parallel import state_sharding

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _cfg(batch_size=8)
    model = build_model(cfg)
    batch = _batch(8)
    loss_computer = LossComputer(cfg)

    import optax
    from diffusiondepth_tpu.training import make_optimizer

    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    mesh_dp = create_mesh("data:8")
    step_dp = make_train_step(model, loss_computer, mesh=mesh_dp, donate=False)
    _, loss_dp, _, _ = step_dp(state, shard_batch(batch, mesh_dp),
                               jax.random.PRNGKey(1))

    mesh_tp = create_mesh("data:4,model:2")
    sh = state_sharding(state, mesh_tp, min_size=2**12)
    state_tp = jax.device_put(state, sh)
    # at least one parameter actually sharded on 'model'
    specs = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda s: s.spec, sh)
    )
    assert any("model" in str(s) for s in specs)
    step_tp = make_train_step(model, loss_computer, mesh=mesh_tp,
                              donate=False, state_shardings=sh)
    _, loss_tp, _, _ = step_tp(state_tp, shard_batch(batch, mesh_tp),
                               jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(loss_tp), float(loss_dp), rtol=1e-4)
