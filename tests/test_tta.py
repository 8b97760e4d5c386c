"""Flip-ensemble TTA eval (leaderboard protocol, BASELINE.json config #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusiondepth_tpu.config import Config
from diffusiondepth_tpu.models import build_model
from diffusiondepth_tpu.training.optim import make_optimizer
from diffusiondepth_tpu.training.steps import _hflip_batch, make_eval_step
from diffusiondepth_tpu.training.train_state import create_train_state


def _batch(b=2, h=32, w=48, seed=0):
    rng = np.random.RandomState(seed)
    gt = np.clip(rng.rand(b, h, w, 1) * 80 + 1, 0, 88).astype(np.float32)
    return {
        "rgb": jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
        "dep": jnp.asarray(gt * (rng.rand(b, h, w, 1) > 0.9)),
        "gt": jnp.asarray(gt),
        "depth_map": jnp.asarray(gt),
        "depth_mask": jnp.ones((b, h, w, 1), np.float32),
    }


def test_hflip_batch_mirrors_images_only():
    batch = dict(_batch(), K=jnp.ones((2, 4)))
    flipped = _hflip_batch(batch)
    np.testing.assert_array_equal(
        np.asarray(flipped["rgb"]), np.asarray(batch["rgb"])[:, :, ::-1]
    )
    np.testing.assert_array_equal(np.asarray(flipped["K"]), np.asarray(batch["K"]))


@pytest.mark.slow
def test_tta_eval_runs_and_averages():
    cfg = Config(
        model_name="Diffusion_DCbase_", backbone_module="mmbev_resnet",
        backbone_name="mmbev_res18", head_specify="DDIMDepthEstimate_Res",
        inference_steps=2, patch_height=32, patch_width=48,
    ).finalize()
    model = build_model(cfg)
    batch = _batch()
    tx = make_optimizer(cfg, 10)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    plain = make_eval_step(model)
    tta = make_eval_step(model, tta_flip=True)
    rng = jax.random.PRNGKey(1)
    pred_p, m_p, _ = plain(state, batch, rng)
    pred_t, m_t, _ = tta(state, batch, rng)
    assert pred_t.shape == pred_p.shape
    assert np.all(np.isfinite(np.asarray(pred_t)))
    assert np.all(np.isfinite(np.asarray(m_t)))
    # the ensemble is a different estimator than the single pass
    assert not np.allclose(np.asarray(pred_t), np.asarray(pred_p))
