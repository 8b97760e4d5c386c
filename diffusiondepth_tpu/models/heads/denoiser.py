"""The conditional denoiser network ("ScheduledCNNRefine").

Re-implements the reference denoiser
(src/model/head/ddim_depth_estimate_res_swin_addHAHI.py:336-381 and the
direct-add variant in src/model/head/ddim_depth_estimate_res.py:300-343):

  * noise embedding: conv(16->64) GN(4) ReLU conv(64->C) GN(4) ReLU
  * learned timestep embedding table Embed(1280, C)
  * fusion: 'add' (condition map already at latent resolution - Res head) or
    'upsample_add' (two plain 3x3 convs after bilinear-upsampled condition +
    noise embedding - Swin/HAHI/MPViT heads; reference UpSample_add :321-333)
  * predictor: conv(C->64) GN(4) ReLU conv(64->16) GN(4) ReLU
    (note the trailing ReLU - the reference's epsilon-prediction is
    non-negative; preserved faithfully)

TPU-first detail: for 'upsample_add' the bilinear upsample of the condition
map is hoisted OUT of the sampling scan (bilinear interpolation is linear and
exact on the spatially-constant timestep embedding, so
``interp(cond + te) == interp(cond) + te``); callers pass the condition
already at latent resolution via :meth:`upsample_condition`. This removes a
per-step resize from the 20-step loop with bit-identical math up to float
reassociation.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from ...ops.resize import resize_bilinear
from ..common import GroupNorm


class _ConvGNBlock(nn.Module):
    """conv3x3 -> GN(4) -> ReLU -> conv3x3 -> GN(4) -> ReLU."""

    mid: int
    out: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.mid, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        x = nn.relu(GroupNorm(4, dtype=self.dtype)(x))
        x = nn.Conv(self.out, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype)(x)
        x = nn.relu(GroupNorm(4, dtype=self.dtype)(x))
        return x


class ScheduledCNNRefine(nn.Module):
    channels_in: int = 256
    channels_noise: int = 16
    fuse: str = "upsample_add"  # 'add' (Res head) | 'upsample_add' (Swin/HAHI)
    num_timestep_embeds: int = 1280
    # Fused Pallas conv chain (ops/fused_denoiser.py): 2.0x the XLA lowering
    # on v5e at the flagship latent shape. Activates only when every guard
    # holds (bf16 policy, 'upsample_add', H % 8 == 0); everything else takes
    # the jnp path below. Scalar AND per-sample timesteps both qualify (the
    # kernels index te per batch row). Backward = hand-written Pallas kernel
    # chain, oracle-verified against f32 autodiff.
    use_fused: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        self.noise_embedding = _ConvGNBlock(64, self.channels_in, dtype=self.dtype)
        self.time_embedding = nn.Embed(
            self.num_timestep_embeds, self.channels_in, dtype=self.dtype
        )
        if self.fuse in ("upsample_add", "upsample_concat"):
            # reference UpSample_add / UpSample (AdaBins fusion): two plain
            # 3x3 convs, bias, no norm/act (addHAHI.py:306-333)
            self.fuse_conv_a = nn.Conv(
                self.channels_in, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
            )
            self.fuse_conv_b = nn.Conv(
                self.channels_in, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype
            )
        self.pred = _ConvGNBlock(64, self.channels_noise, dtype=self.dtype)

    @staticmethod
    def _on_tpu() -> bool:
        import jax

        return jax.default_backend() == "tpu"

    def fused_active(self, latent_h: int) -> bool:
        """True when a scalar-timestep call takes the fused Pallas chain —
        the sampler keys its scan-remat strategy off this (ddim_head.py)."""
        return (
            self.use_fused
            and self.fuse == "upsample_add"
            and self.dtype == jnp.bfloat16
            and latent_h % 8 == 0
            and not self.is_initializing()
            and self._on_tpu()
        )

    def upsample_condition(self, cond: jnp.ndarray, latent_hw) -> jnp.ndarray:
        """Bring the condition map to latent resolution once, outside the scan.

        align_corners=True matches the reference's F.interpolate call inside
        UpSample_add (ddim_depth_estimate_res_swin_addHAHI.py:332).
        """
        if self.fuse in ("upsample_add", "upsample_concat"):
            return resize_bilinear(cond, tuple(latent_hw), align_corners=True)
        # 'add' assumes the condition already sits at latent resolution (the
        # Res head with the default H/2 transform); with other transforms
        # (e.g. the X4 quarter-res latent) bring it there the same way
        if tuple(cond.shape[1:3]) != tuple(latent_hw):
            return resize_bilinear(cond, tuple(latent_hw), align_corners=True)
        return cond

    def sampler_step(self, x_f32, x_bf16, t, cond_p, padded_w: int, sched,
                     save_u4: bool = True, save_u5p: bool = True):
        """One whole DDIM sampler step (denoiser + scheduler update) through
        the fused Pallas op — padded layout, (f32, bf16) latent pair; see
        ops/fused_denoiser.py fused_sampler_step. Only called by
        ddim_head._sample when fused_active and the scheduler matches the
        op's shipped configuration. ``save_u4``/``save_u5p`` are the static
        residual-HBM gates (ops/fused_denoiser.py u4_stack_fits /
        u5_pad_stack_fits) the head computes from the scan depth."""
        from ...ops.fused_denoiser import fused_sampler_step

        assert self.fused_active(x_f32.shape[1])
        te = self.time_embedding(jnp.asarray(t))
        te_b = jnp.broadcast_to(te[None, :], (x_f32.shape[0], te.shape[-1]))
        return fused_sampler_step(
            int(padded_w), bool(save_u4), bool(save_u5p),
            self.variables["params"], x_f32, x_bf16, cond_p, te_b, sched,
        )

    def __call__(
        self,
        noisy_latent: jnp.ndarray,
        t,
        cond_latent: jnp.ndarray,
        padded_w: Optional[int] = None,
        save_u4: bool = True,
        save_u5p: bool = True,
    ) -> jnp.ndarray:
        """Predict noise.

        noisy_latent: (B, h, w, 16); t: scalar int or (B,) ints;
        cond_latent: (B, h, w, C) condition already at latent resolution.

        ``padded_w``: the sampling scan's padded-layout path — latent and
        condition arrive in the zero-border (B, h, Wp, C) conv layout
        (Wp = padded_width(padded_w)) and eps returns in it. Only valid when
        the fused Pallas chain is active (ddim_head._sample sets it);
        ``save_u4`` is that path's static residual-HBM gate.
        """
        te = self.time_embedding(jnp.asarray(t))
        scalar_t = te.ndim == 1

        if padded_w is not None:
            from ...ops.fused_denoiser import fused_denoiser_padded

            assert self.fused_active(noisy_latent.shape[1])
            te_b = (
                jnp.broadcast_to(
                    te[None, :], (noisy_latent.shape[0], te.shape[-1])
                )
                if scalar_t
                else te  # per-sample t (training ddim_loss padded call)
            )
            return fused_denoiser_padded(
                int(padded_w), bool(save_u4), bool(save_u5p),
                self.variables["params"], noisy_latent, cond_latent, te_b,
            )

        if self.fused_active(noisy_latent.shape[1]):
            from ...ops.fused_denoiser import fused_denoiser

            # cond and te stay separate through the custom_vjp so the
            # sampling scan's saved residuals are (hoisted cond, vector te),
            # not a stacked per-step sum (see fused_denoiser docstring).
            # Per-sample timesteps (the training ddim_loss call,
            # ddim_head._ddim_loss) take this path too: the link kernels
            # index te per batch row (fused_denoiser._fused_link te spec) and
            # the backward returns a per-sample (B, C) dte, so the
            # per-sample-t case is the general one — scalar t is just its
            # broadcast. Routing the loss call here replaced an XLA
            # fwd+autodiff-bwd of the whole chain per train step (r5).
            te_b = (
                jnp.broadcast_to(
                    te[None, :], (noisy_latent.shape[0], te.shape[-1])
                )
                if scalar_t
                else te
            )
            return fused_denoiser(
                self.variables["params"], noisy_latent, cond_latent, te_b
            )

        if scalar_t:  # scalar timestep (sampling)
            te = te[None, None, None, :]
        else:  # per-sample timesteps (training loss)
            te = te[:, None, None, :]
        feat = cond_latent + te.astype(cond_latent.dtype)

        ne = self.noise_embedding(noisy_latent)
        if self.fuse == "add":
            h = feat + ne
        elif self.fuse == "upsample_add":
            h = self.fuse_conv_b(self.fuse_conv_a(feat + ne))
        elif self.fuse == "upsample_concat":
            # 'bins' variants concatenate instead of adding (reference
            # ddim_depth_estimate_res_swin_bins.py:339,369)
            h = self.fuse_conv_b(
                self.fuse_conv_a(jnp.concatenate([feat, ne], axis=-1))
            )
        else:
            raise ValueError(self.fuse)
        return self.pred(h)
