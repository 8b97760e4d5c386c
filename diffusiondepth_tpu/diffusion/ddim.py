"""DDIM scheduler, TPU-native.

Re-implements the semantics of the reference's vendored HuggingFace scheduler
(reference: src/model/diffusers/schedulers/scheduling_ddim.py:101-399) as pure
functions over precomputed tables, so that the whole sampling loop compiles to
one ``lax.scan`` with zero host<->device synchronisation. The reference instead
runs a Python loop doing float math on ``alphas_cumprod`` per step
(scheduling_ddim.py:231-353) - a per-step host sync.

Also provides the log-biased timestep variant of ``scheduling_ddim_si.py``
(reference: src/model/diffusers/schedulers/scheduling_ddim_si.py:234-251).

Conventions: all tables are float32 numpy at construction; the scan pulls
per-step scalars from stacked arrays.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_betas(
    beta_schedule: str = "linear",
    num_train_timesteps: int = 1000,
    beta_start: float = 0.0001,
    beta_end: float = 0.02,
    max_beta: float = 0.999,
) -> np.ndarray:
    """Beta table (reference: scheduling_ddim.py:128-141 and 72-98)."""
    if beta_schedule == "linear":
        return np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float32)
    if beta_schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start ** 0.5, beta_end ** 0.5, num_train_timesteps, dtype=np.float32
            )
            ** 2
        )
    if beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1 - alpha_bar((i + 1) / num_train_timesteps) / alpha_bar(i / num_train_timesteps), max_beta)
            for i in range(num_train_timesteps)
        ]
        return np.asarray(betas, dtype=np.float32)
    raise NotImplementedError(beta_schedule)


class InferenceTables(NamedTuple):
    """Per-step constants for the reverse process, stacked for ``lax.scan``."""

    timesteps: jnp.ndarray  # (N,) int32, descending
    alpha_prod_t: jnp.ndarray  # (N,) float32
    alpha_prod_prev: jnp.ndarray  # (N,) float32


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Immutable DDIM schedule. Construct once (host side), close over in jit."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.0001
    beta_end: float = 0.02
    beta_schedule: str = "linear"
    clip_sample: bool = False
    set_alpha_to_one: bool = True
    steps_offset: int = 0
    prediction_type: str = "epsilon"
    # derived tables (numpy so the dataclass stays hashable-by-identity for jit)
    betas: np.ndarray = dataclasses.field(default=None, repr=False)
    alphas_cumprod: np.ndarray = dataclasses.field(default=None, repr=False)

    def __post_init__(self):
        if self.betas is None:
            object.__setattr__(
                self,
                "betas",
                make_betas(
                    self.beta_schedule,
                    self.num_train_timesteps,
                    self.beta_start,
                    self.beta_end,
                ),
            )
        if self.alphas_cumprod is None:
            object.__setattr__(
                self, "alphas_cumprod", np.cumprod(1.0 - self.betas, axis=0).astype(np.float32)
            )

    @property
    def final_alpha_cumprod(self) -> float:
        # reference: scheduling_ddim.py:150
        return 1.0 if self.set_alpha_to_one else float(self.alphas_cumprod[0])

    @property
    def init_noise_sigma(self) -> float:
        return 1.0

    # ------------------------------------------------------------------ #
    # Timestep selection
    # ------------------------------------------------------------------ #
    def inference_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Uniform-stride timesteps, descending (reference: scheduling_ddim.py:215-229)."""
        step_ratio = self.num_train_timesteps // num_inference_steps
        t = (np.arange(0, num_inference_steps) * step_ratio).round()[::-1].astype(np.int64)
        return t + self.steps_offset

    # the hand-picked log-spaced schedule of the reference's 'SI' variant
    # (scheduling_ddim_si.py:32 ``dummy_prefix_times``), descending
    SI_TIMESTEPS_20 = (999, 500, 250, 125, 80, 50, 35, 20, 15, 12,
                       9, 8, 7, 6, 5, 4, 3, 2, 1, 0)

    def biased_timesteps(self, num_inference_steps: int) -> np.ndarray:
        """Timesteps concentrating steps near t=0, descending
        (reference: scheduling_ddim_si.py:234-251 ``set_biased_timesteps``).
        For 20 steps this is the reference's exact hand-picked table; other
        counts use the same log-spacing rule."""
        if num_inference_steps == len(self.SI_TIMESTEPS_20):
            return np.asarray(self.SI_TIMESTEPS_20, np.int64) + self.steps_offset
        x = np.linspace(0.0, 1.0, num_inference_steps)
        t = np.exp(np.log(float(self.num_train_timesteps)) * x) - 1.0
        t = np.clip(np.round(t), 0, self.num_train_timesteps - 1).astype(np.int64)
        t = np.unique(t)
        while len(t) < num_inference_steps:
            candidates = np.setdiff1d(np.arange(self.num_train_timesteps), t)
            t = np.sort(np.append(t, candidates[-1]))
        return t[::-1].copy() + self.steps_offset

    def inference_tables(
        self, num_inference_steps: int, timesteps: Optional[np.ndarray] = None
    ) -> InferenceTables:
        """Stacked per-step (t, alpha_t, alpha_prev) for scan-based sampling.

        prev(t) is the NEXT entry of the descending sequence (for uniform
        schedules this equals ``t - step_gap``, reference
        scheduling_ddim.py:269; for biased schedules it is the list
        predecessor - the reference's SI step() does the same lookup,
        scheduling_ddim_si.py:308, except its final step wraps around to
        t=999, a latent-destroying quirk we fix to final_alpha)."""
        if timesteps is None:
            timesteps = self.inference_timesteps(num_inference_steps)
        timesteps = np.asarray(timesteps, np.int64)
        prev_timesteps = np.append(timesteps[1:], -1)
        alpha_t = self.alphas_cumprod[timesteps]
        alpha_prev = np.where(
            prev_timesteps >= 0,
            self.alphas_cumprod[np.clip(prev_timesteps, 0, None)],
            self.final_alpha_cumprod,
        ).astype(np.float32)
        return InferenceTables(
            timesteps=jnp.asarray(timesteps, jnp.int32),
            alpha_prod_t=jnp.asarray(alpha_t, jnp.float32),
            alpha_prod_prev=jnp.asarray(alpha_prev, jnp.float32),
        )

    # ------------------------------------------------------------------ #
    # Forward process
    # ------------------------------------------------------------------ #
    def add_noise(
        self, original_samples: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """q(x_t | x_0) (reference: scheduling_ddim.py:355-376)."""
        acp = jnp.asarray(self.alphas_cumprod, original_samples.dtype)
        a = acp[timesteps]
        sqrt_alpha = jnp.sqrt(a).reshape(a.shape + (1,) * (original_samples.ndim - a.ndim))
        sqrt_one_minus = jnp.sqrt(1.0 - a).reshape(
            a.shape + (1,) * (original_samples.ndim - a.ndim)
        )
        return sqrt_alpha * original_samples + sqrt_one_minus * noise

    def get_velocity(
        self, sample: jnp.ndarray, noise: jnp.ndarray, timesteps: jnp.ndarray
    ) -> jnp.ndarray:
        """v-prediction target (reference: scheduling_ddim.py:378-396)."""
        acp = jnp.asarray(self.alphas_cumprod, sample.dtype)
        a = acp[timesteps]
        sqrt_alpha = jnp.sqrt(a).reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        sqrt_one_minus = jnp.sqrt(1.0 - a).reshape(a.shape + (1,) * (sample.ndim - a.ndim))
        return sqrt_alpha * noise - sqrt_one_minus * sample

    # ------------------------------------------------------------------ #
    # Reverse process
    # ------------------------------------------------------------------ #
    def step_from_alphas(
        self,
        model_output: jnp.ndarray,
        sample: jnp.ndarray,
        alpha_prod_t: jnp.ndarray,
        alpha_prod_prev: jnp.ndarray,
        eta: float = 0.0,
        use_clipped_model_output: bool = True,
        variance_noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One DDIM reverse step given per-step alphas (eq. 12/16 of the DDIM
        paper; mirrors reference scheduling_ddim.py:231-353). Returns
        ``(prev_sample, pred_original_sample)``.

        Pulling alphas from precomputed tables (instead of indexing by a host
        timestep) makes this a pure scan body.
        """
        beta_prod_t = 1.0 - alpha_prod_t
        sqrt_alpha_t = jnp.sqrt(alpha_prod_t)
        sqrt_beta_t = jnp.sqrt(beta_prod_t)

        if self.prediction_type == "epsilon":
            pred_original = (sample - sqrt_beta_t * model_output) / sqrt_alpha_t
        elif self.prediction_type == "sample":
            pred_original = model_output
        elif self.prediction_type == "v_prediction":
            pred_original = sqrt_alpha_t * sample - sqrt_beta_t * model_output
            model_output = sqrt_alpha_t * model_output + sqrt_beta_t * sample
        else:
            raise ValueError(self.prediction_type)

        if self.clip_sample:
            pred_original = jnp.clip(pred_original, -1.0, 1.0)

        # sigma_t(eta), reference scheduling_ddim.py:205-213
        variance = (1.0 - alpha_prod_prev) / beta_prod_t * (1.0 - alpha_prod_t / alpha_prod_prev)
        std_dev_t = eta * jnp.sqrt(variance)

        if use_clipped_model_output:
            # re-derive epsilon from (possibly clipped) x0, reference :318-320
            model_output = (sample - sqrt_alpha_t * pred_original) / sqrt_beta_t

        pred_dir = jnp.sqrt(1.0 - alpha_prod_prev - std_dev_t ** 2) * model_output
        prev_sample = jnp.sqrt(alpha_prod_prev) * pred_original + pred_dir

        if eta > 0:
            assert variance_noise is not None, "eta>0 requires variance_noise"
            prev_sample = prev_sample + std_dev_t * variance_noise

        return prev_sample, pred_original

    def step(
        self,
        model_output: jnp.ndarray,
        timestep,
        sample: jnp.ndarray,
        num_inference_steps: int,
        eta: float = 0.0,
        use_clipped_model_output: bool = True,
        variance_noise: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """HF-style API (timestep-indexed); used for golden parity tests."""
        acp = jnp.asarray(self.alphas_cumprod)
        prev_t = timestep - self.num_train_timesteps // num_inference_steps
        alpha_t = acp[timestep]
        alpha_prev = jnp.where(
            prev_t >= 0, acp[jnp.clip(prev_t, 0, None)], self.final_alpha_cumprod
        )
        return self.step_from_alphas(
            model_output, sample, alpha_t, alpha_prev, eta,
            use_clipped_model_output, variance_noise,
        )

    # ------------------------------------------------------------------ #
    # Full on-device sampler
    # ------------------------------------------------------------------ #
    def sample(
        self,
        denoise_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        rng: jax.Array,
        shape: Tuple[int, ...],
        num_inference_steps: int,
        dtype=jnp.float32,
        eta: float = 0.0,
        use_clipped_model_output: bool = True,
        remat: bool = True,
        return_trajectory: bool = False,
        timesteps: Optional[np.ndarray] = None,
    ) -> jnp.ndarray:
        """Run the entire reverse process as one ``lax.scan``.

        ``denoise_fn(latent, t_int32_scalar) -> model_output`` is typically a
        closure over the condition map and network params. Replaces the
        reference's host loop (CNNDDIMPipiline.__call__,
        src/model/head/ddim_depth_estimate_res.py:274-296).

        ``remat=True`` wraps the scan body in ``jax.checkpoint`` so training
        through the sampler stores one step of activations instead of N
        (trades FLOPs for HBM - the standard TPU recipe).
        """
        tables = self.inference_tables(num_inference_steps, timesteps)
        latent = jax.random.normal(rng, shape, dtype)

        if eta > 0:
            n = tables.timesteps.shape[0]
            noise_rngs = jax.random.split(jax.random.fold_in(rng, 1), n)
        else:
            noise_rngs = jnp.zeros((tables.timesteps.shape[0], 2), jnp.uint32)

        def body(x, per_step):
            t, a_t, a_prev, nrng = per_step
            model_output = denoise_fn(x, t)
            vnoise = (
                jax.random.normal(nrng, x.shape, x.dtype) if eta > 0 else None
            )
            x_prev, _ = self.step_from_alphas(
                model_output, x,
                a_t.astype(x.dtype), a_prev.astype(x.dtype),
                eta, use_clipped_model_output, vnoise,
            )
            return x_prev, (x_prev if return_trajectory else None)

        if remat:
            body = jax.checkpoint(body)
        final, traj = jax.lax.scan(
            body, latent,
            (tables.timesteps, tables.alpha_prod_t, tables.alpha_prod_prev, noise_rngs),
        )
        if return_trajectory:
            return final, traj
        return final
