"""NLSPN model tests (reference: src/model/nlspnmodel.py).

Structural invariant: with the zero-initialised offset/affinity conv
(reference :56-57), every tap's offset is 0 and TGASS affinity is
tanh(0)=0, so after normalisation the centre affinity is exactly 1 -
``prop_time`` propagation steps must be an identity and pred == pred_init
(up to the clamp at :356)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model


def _sample(b=1, h=32, w=48, seed=0):
    rng = np.random.RandomState(seed)
    gt = np.clip(rng.rand(b, h, w, 1) * 80 + 1, 0, 88).astype(np.float32)
    return {
        "rgb": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "dep": jnp.asarray(gt * (rng.rand(b, h, w, 1) > 0.9)),
        "gt": jnp.asarray(gt),
    }


@pytest.fixture(scope="module")
def nlspn_out():
    cfg = Config(
        model_name="NLSPN", network="resnet18", prop_time=3, prop_kernel=3,
        affinity="TGASS", conf_prop=True, patch_height=32, patch_width=48,
    ).finalize()
    model = build_model(cfg)
    sample = _sample()
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)
    out = model.apply(variables, sample, train=False)
    return cfg, sample, out


def test_output_contract(nlspn_out):
    cfg, sample, out = nlspn_out
    b, h, w = 1, 32, 48
    assert out["pred"].shape == (b, h, w, 1)
    assert out["pred_init"].shape == (b, h, w, 1)
    assert out["pred_inter"].shape == (cfg.prop_time, b, h, w, 1)
    assert out["guidance"].shape == (b, h, w, 8)
    assert out["offset"].shape == (b, h, w, 18)  # (8+1 taps) * 2
    assert out["aff"].shape == (b, h, w, 9)
    assert out["confidence"].shape == (b, h, w, 1)
    assert np.all(np.asarray(out["pred"]) >= 0)


def test_nlspn_summary_panels_and_raw_dumps(nlspn_out, tmp_path):
    """NLSPN summary writes the reference's per-sample panel files and
    guidance/offset/aff/gamma .npy dumps (reference nlspnsummary.py:165-267),
    plus the confidence strip + Etc/gamma scalar in update (:102-157)."""
    import json
    import os

    from diffusiondepth_tpu.summary import get as get_summary

    cfg, sample, out = nlspn_out
    cfg2 = Config.from_dict(dict(cfg.to_dict(), save_dir=str(tmp_path),
                                 save_raw_npdepth=True))
    writer_cls = get_summary(cfg2)
    assert set(writer_cls.SAVE_KEYS) >= {"guidance", "offset", "aff", "gamma"}
    writer = writer_cls(str(tmp_path), "test", cfg2)

    output = {k: np.asarray(v) for k, v in out.items() if v is not None}
    writer.save(0, 0, {k: np.asarray(v) for k, v in sample.items()}, output)
    d = tmp_path / "test" / "epoch0000" / f"{0:08d}"
    expect = ["01_rgb.png", "02_dep.png", "03_pred_init.png",
              "04_pred_prop_00.png", "04_pred_prop_02.png",
              "05_pred_final.png", "05_pred_final_gray.png", "06_gt.png",
              "guidance.npy", "offset.npy", "aff.npy", "gamma.npy", "pred.npy"]
    for name in expect:
        assert (d / name).exists(), name
    assert np.load(d / "guidance.npy").shape == (32, 48, 8)

    # update: metric line + panel with confidence strip + gamma scalar
    writer.add(metric=np.ones((1, 8), np.float32))
    writer.update(1, {k: np.asarray(v) for k, v in sample.items()}, output)
    assert (tmp_path / "test" / "images" / "step_000001.png").exists()
    scalars = [json.loads(l) for l in
               open(tmp_path / "scalars_test.jsonl").read().splitlines()]
    assert any(s["tag"] == "Etc/gamma" for s in scalars)

    # save_result_only path keeps the KITTI submission format
    cfg3 = Config.from_dict(dict(cfg2.to_dict(), save_result_only=True))
    writer2 = writer_cls(str(tmp_path / "sub"), "test", cfg3)
    writer2.save(0, 5, {k: np.asarray(v) for k, v in sample.items()}, output)
    assert (tmp_path / "sub" / "test" / "epoch0000" / f"{5:010d}.png").exists()


def test_zero_init_propagation_is_identity(nlspn_out):
    cfg, sample, out = nlspn_out
    np.testing.assert_allclose(
        np.asarray(out["pred"]),
        np.clip(np.asarray(out["pred_init"]), 0, None),
        rtol=1e-5, atol=1e-5,
    )
    # centre affinity exactly 1, others 0
    aff = np.asarray(out["aff"])
    np.testing.assert_allclose(aff[..., 4], 1.0, atol=1e-6)
    np.testing.assert_allclose(np.delete(aff, 4, axis=-1), 0.0, atol=1e-6)


@pytest.mark.slow
def test_nlspn_trains_one_step(nlspn_out):
    cfg, sample, out = nlspn_out
    from diffusiondepth_tpu.losses import LossComputer
    from diffusiondepth_tpu.models import build_model
    from diffusiondepth_tpu.training.optim import make_optimizer
    from diffusiondepth_tpu.training.steps import make_train_step
    from diffusiondepth_tpu.training.train_state import create_train_state

    cfg2 = Config.from_dict(dict(cfg.to_dict(), loss="1.0*L1+1.0*L2"))
    model = build_model(cfg2)
    batch = dict(_sample(b=2), )
    tx = make_optimizer(cfg2, steps_per_epoch=10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    # snapshot before the step: the train step donates its input state
    l0 = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    step = make_train_step(model, LossComputer(cfg2))
    state2, loss, loss_val, metric = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    # gradients actually flowed
    l1 = jax.tree_util.tree_leaves(state2.params)
    assert any(not np.allclose(a, b) for a, b in zip(l0, l1))
