"""Golden tests for the DDIM schedule against independently-computed
closed-form values (torch reference formulas re-derived in numpy; reference
semantics: src/model/diffusers/schedulers/scheduling_ddim.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffusiondepth_tpu.diffusion import DDIMSchedule, make_betas


def test_linear_betas_match_torch_linspace():
    betas = make_betas("linear", 1000, 0.0001, 0.02)
    expected = np.linspace(0.0001, 0.02, 1000, dtype=np.float32)
    np.testing.assert_allclose(betas, expected, rtol=1e-7)


def test_squaredcos_betas():
    import math

    betas = make_betas("squaredcos_cap_v2", 100)

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    expected = [
        min(1 - alpha_bar((i + 1) / 100) / alpha_bar(i / 100), 0.999) for i in range(100)
    ]
    np.testing.assert_allclose(betas, expected, rtol=1e-6)


def test_inference_timesteps_uniform_stride():
    sched = DDIMSchedule(num_train_timesteps=1000)
    t = sched.inference_timesteps(20)
    expected = (np.arange(0, 20) * 50).round()[::-1].astype(np.int64)
    np.testing.assert_array_equal(t, expected)
    assert t[0] == 950 and t[-1] == 0


def test_add_noise_closed_form():
    sched = DDIMSchedule(num_train_timesteps=1000)
    rng = np.random.RandomState(0)
    x0 = rng.randn(2, 4, 4, 3).astype(np.float32)
    noise = rng.randn(2, 4, 4, 3).astype(np.float32)
    t = np.array([10, 500])
    out = sched.add_noise(jnp.asarray(x0), jnp.asarray(noise), jnp.asarray(t))
    acp = np.cumprod(1 - np.linspace(0.0001, 0.02, 1000, dtype=np.float32))
    for b in range(2):
        expected = np.sqrt(acp[t[b]]) * x0[b] + np.sqrt(1 - acp[t[b]]) * noise[b]
        np.testing.assert_allclose(np.asarray(out)[b], expected, rtol=2e-5, atol=1e-5)


def test_step_epsilon_prediction_closed_form():
    """DDIM eq.12 with eta=0, clip off, clipped-model-output on (the head's
    exact configuration, ddim_depth_estimate_res.py:291)."""
    sched = DDIMSchedule(num_train_timesteps=1000, clip_sample=False)
    rng = np.random.RandomState(1)
    sample = rng.randn(1, 4, 4, 2).astype(np.float32)
    eps = rng.randn(1, 4, 4, 2).astype(np.float32)
    t = 950
    n_steps = 20
    prev_sample, x0 = sched.step(
        jnp.asarray(eps), t, jnp.asarray(sample), num_inference_steps=n_steps
    )
    acp = np.cumprod(1 - np.linspace(0.0001, 0.02, 1000, dtype=np.float32))
    a_t, a_prev = acp[t], acp[t - 50]
    x0_expected = (sample - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    # use_clipped_model_output with clip_sample=False re-derives eps exactly
    eps2 = (sample - np.sqrt(a_t) * x0_expected) / np.sqrt(1 - a_t)
    prev_expected = np.sqrt(a_prev) * x0_expected + np.sqrt(1 - a_prev) * eps2
    np.testing.assert_allclose(np.asarray(x0), x0_expected, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(prev_sample), prev_expected, rtol=2e-4, atol=2e-4)


def test_final_step_uses_final_alpha_cumprod():
    sched = DDIMSchedule(num_train_timesteps=1000)
    tables = sched.inference_tables(20)
    # last entry: t=0 -> prev_t=-50 -> alpha_prev = 1.0 (set_alpha_to_one)
    assert float(tables.alpha_prod_prev[-1]) == 1.0


def test_scan_sampler_matches_python_loop():
    """The lax.scan sampler must equal the step-by-step loop exactly."""
    sched = DDIMSchedule(num_train_timesteps=100)
    n_steps = 5

    def denoise_fn(x, t):
        # a fake denoiser: deterministic function of x and t
        return 0.1 * x + 0.01 * jnp.float32(t)

    rng = jax.random.PRNGKey(0)
    out_scan = sched.sample(denoise_fn, rng, (1, 4, 4, 2), n_steps, remat=False)

    # python reference loop using the HF-style step API
    x = jax.random.normal(rng, (1, 4, 4, 2), jnp.float32)
    for t in sched.inference_timesteps(n_steps):
        eps = denoise_fn(x, jnp.int32(t))
        x, _ = sched.step(eps, int(t), x, num_inference_steps=n_steps)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_get_velocity():
    sched = DDIMSchedule(num_train_timesteps=1000)
    rng = np.random.RandomState(3)
    x = rng.randn(2, 3, 3, 1).astype(np.float32)
    noise = rng.randn(2, 3, 3, 1).astype(np.float32)
    t = np.array([0, 999])
    v = sched.get_velocity(jnp.asarray(x), jnp.asarray(noise), jnp.asarray(t))
    acp = np.cumprod(1 - np.linspace(0.0001, 0.02, 1000, dtype=np.float32))
    for b in range(2):
        expected = np.sqrt(acp[t[b]]) * noise[b] - np.sqrt(1 - acp[t[b]]) * x[b]
        np.testing.assert_allclose(np.asarray(v)[b], expected, rtol=2e-5, atol=1e-5)


def test_biased_timesteps_si_variant():
    sched = DDIMSchedule(num_train_timesteps=1000)
    t = sched.biased_timesteps(20)
    assert len(t) == 20
    assert (np.diff(t) < 0).all()  # strictly descending
    assert t.min() >= 0 and t.max() < 1000
    # log spacing concentrates steps near t=0
    assert (t < 100).sum() >= (t > 900).sum()
