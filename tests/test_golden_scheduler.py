"""Golden-value parity: our DDIM schedule vs the REFERENCE's own vendored
scheduler code executed directly (it is numpy/torch-only, so we import
/root/reference/src/model/diffusers/schedulers/scheduling_ddim.py and compare
outputs — SURVEY.md §4 test-pyramid layer 3)."""

import importlib.util
import os

import numpy as np
import pytest
import torch

from diffusiondepth_tpu.diffusion.ddim import DDIMSchedule

REF = "/root/reference/src/model/diffusers/schedulers/scheduling_ddim.py"


@pytest.fixture(scope="module")
def ref_mod():
    if not os.path.exists(REF):
        pytest.skip("reference tree not mounted")
    spec = importlib.util.spec_from_file_location("ref_scheduling_ddim", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("schedule", ["linear", "scaled_linear", "squaredcos_cap_v2"])
def test_beta_tables_match(ref_mod, schedule):
    ref = ref_mod.DDIMScheduler(num_train_timesteps=1000, beta_schedule=schedule)
    ours = DDIMSchedule(num_train_timesteps=1000, beta_schedule=schedule)
    np.testing.assert_allclose(ours.betas, ref.betas.numpy(), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        ours.alphas_cumprod, ref.alphas_cumprod.numpy(), rtol=1e-5, atol=1e-7
    )


def test_set_timesteps_match(ref_mod):
    ref = ref_mod.DDIMScheduler(num_train_timesteps=1000)
    ref.set_timesteps(20)
    ours = DDIMSchedule(num_train_timesteps=1000)
    np.testing.assert_array_equal(
        ours.inference_timesteps(20), ref.timesteps.numpy()
    )


def test_add_noise_matches(ref_mod):
    rng = np.random.RandomState(0)
    x0 = rng.randn(4, 8, 8, 3).astype(np.float32)
    noise = rng.randn(4, 8, 8, 3).astype(np.float32)
    t = np.asarray([0, 10, 500, 999])

    ref = ref_mod.DDIMScheduler(num_train_timesteps=1000)
    # torch layout NCHW vs our NHWC is irrelevant for broadcast math; use
    # flat (B, ...) tensors directly
    got_ref = ref.add_noise(
        torch.from_numpy(x0), torch.from_numpy(noise), torch.from_numpy(t)
    ).numpy()

    ours = DDIMSchedule(num_train_timesteps=1000)
    got = np.asarray(ours.add_noise(x0, noise, t))
    np.testing.assert_allclose(got, got_ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("use_clipped", [True, False])
def test_full_reverse_trajectory_matches(ref_mod, use_clipped):
    """Run 20 reference step() calls vs our scan tables with identical fake
    model outputs; latents must match step-for-step."""
    steps = 20
    rng = np.random.RandomState(1)
    latent_ref = torch.from_numpy(rng.randn(1, 16, 8, 12).astype(np.float32))
    latent_ours = np.asarray(latent_ref)

    ref = ref_mod.DDIMScheduler(num_train_timesteps=1000, clip_sample=False)
    ref.set_timesteps(steps)
    ours = DDIMSchedule(num_train_timesteps=1000, clip_sample=False)
    tables = ours.inference_tables(steps)

    eps_seq = [rng.randn(1, 16, 8, 12).astype(np.float32) for _ in range(steps)]
    for i, t in enumerate(ref.timesteps):
        out = ref.step(
            torch.from_numpy(eps_seq[i]), t, latent_ref,
            eta=0.0, use_clipped_model_output=use_clipped,
        )
        latent_ref = out["prev_sample"]
        import jax.numpy as jnp

        latent_ours, _ = ours.step_from_alphas(
            jnp.asarray(eps_seq[i]), jnp.asarray(latent_ours),
            float(tables.alpha_prod_t[i]), float(tables.alpha_prod_prev[i]),
            eta=0.0, use_clipped_model_output=use_clipped,
        )
        latent_ours = np.asarray(latent_ours)
        np.testing.assert_allclose(
            latent_ours, latent_ref.numpy(), rtol=2e-4, atol=2e-5,
            err_msg=f"diverged at step {i} (t={int(t)})",
        )


def test_get_velocity_matches(ref_mod):
    rng = np.random.RandomState(2)
    x = rng.randn(2, 4, 4, 1).astype(np.float32)
    noise = rng.randn(2, 4, 4, 1).astype(np.float32)
    t = np.asarray([3, 700])
    ref = ref_mod.DDIMScheduler(num_train_timesteps=1000)
    got_ref = ref.get_velocity(
        torch.from_numpy(x), torch.from_numpy(noise), torch.from_numpy(t)
    ).numpy()
    ours = DDIMSchedule(num_train_timesteps=1000)
    np.testing.assert_allclose(
        np.asarray(ours.get_velocity(x, noise, t)), got_ref, rtol=1e-5, atol=1e-6
    )
