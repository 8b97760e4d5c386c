"""DDIM depth-estimation heads.

Re-implements the reference head family (src/model/head/ddim_depth_estimate_res.py,
..._swin_add.py, ..._swin_addHAHI.py, ..._mpvit_HAHI.py, and the *Vis variants)
as one parameterised Flax module:

  1. (optional) HAHI neck over the backbone pyramid
  2. FPN top-down aggregation into a single ``fpn_dim``-channel condition map
     at the resolution of the finest backbone level (reference :108-121)
  3. GT depth encoded to a 16-ch half-resolution latent via the learned depth
     transform (reference :102) - its shape also sizes the sampling latent
     (reference quirk, :134)
  4. DDIM sampling: latent ~ N(0,1), ``inference_steps`` reverse steps with the
     conditional denoiser. Reference runs a Python loop with per-step host math
     (CNNDDIMPipiline :254-296); here it is a single ``nn.scan`` (lax.scan)
     over precomputed alpha tables, rematerialised for training memory.
  5. decode latent -> metric depth via ``depth_transform.inv_t`` (:146)
  6. self-diffusion DDIM loss: add noise at a random timestep to the model's
     own refined latent and regress it (reference ddim_loss :207-223)

Output dict keys match the reference contract exactly (:177-182).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...diffusion.ddim import DDIMSchedule
from ...ops.resize import adaptive_avg_pool2d
from ...registry import HEADS
from ..common import ConvBNAct, DeconvBNAct
from ..depth_transform import build_depth_transform
from .denoiser import ScheduledCNNRefine

DEFAULT_DEPTH_TRANSFORM = dict(type="DeepDepthTransformWithUpsampling", hidden=16, eps=1e-6)


class DDIMDepthEstimateHead(nn.Module):
    in_channels: Sequence[int] = (64, 128, 256, 512)
    fpn_dim: int = 256
    depth_feature_dim: int = 16
    inference_steps: int = 20
    num_train_timesteps: int = 1000
    fuse: str = "add"  # 'add' (Res) | 'upsample_add' (Swin/HAHI/MPViT)
    use_hahi: bool = False
    hahi_embedding_dim: int = 512
    hahi_self_att: bool = False
    hahi_cross_att: bool = False
    hahi_num_points: int = 8
    vis: bool = False  # also return per-step decoded depths ('pred_inter')
    depth_transform_cfg: Any = None
    eta: float = 0.0
    # 'uniform' (scheduling_ddim.py) or 'biased' (scheduling_ddim_si.py's
    # log-spaced SI table - the reference ships it unused, SURVEY.md 2.3)
    timestep_schedule: str = "uniform"
    # fused Pallas denoiser chain (ops/fused_denoiser.py); guards inside the
    # denoiser decide per-call whether it can apply
    use_fused_denoiser: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        cfg = self.depth_transform_cfg or DEFAULT_DEPTH_TRANSFORM
        self.depth_transform = build_depth_transform(dict(cfg, dtype=self.dtype))
        self.model = ScheduledCNNRefine(
            channels_in=self.fpn_dim,
            channels_noise=self.depth_feature_dim,
            fuse=self.fuse,
            use_fused=self.use_fused_denoiser,
            dtype=self.dtype,
        )
        self.schedule = DDIMSchedule(
            num_train_timesteps=self.num_train_timesteps, clip_sample=False
        )
        if self.use_hahi:
            from ..necks.hahi import HAHIHeteroNeck

            self.hahineck = HAHIHeteroNeck(
                in_channels=tuple(self.in_channels),
                out_channels=tuple(self.in_channels),
                embedding_dim=self.hahi_embedding_dim,
                self_att=self.hahi_self_att,
                cross_att=self.hahi_cross_att,
                num_points=self.hahi_num_points,
                dtype=self.dtype,
            )
        # FPN (reference :57-84): lateral 3x3 conv+BN+ReLU per level; deconv
        # k2s2+BN+ReLU up-path for levels 1..n-1 (conv_up[j] fuses INTO level j).
        self.conv_lateral = [
            ConvBNAct(self.fpn_dim, 3, 1, 1, act="relu", dtype=self.dtype,
                      name=f"conv_lateral_{i}")
            for i in range(len(self.in_channels))
        ]
        self.conv_up = [
            DeconvBNAct(self.fpn_dim, 2, 2, act="relu", dtype=self.dtype,
                        name=f"conv_up_{i}")
            for i in range(len(self.in_channels) - 1)
        ]

    # ------------------------------------------------------------------ #
    def _fpn_condition(self, fp: Sequence[jnp.ndarray], train: bool) -> jnp.ndarray:
        """Top-down FPN collapse to a single condition map (reference :112-122)."""
        n = len(fp)
        x = None
        for i in range(n):
            j = n - i - 1
            lat = self.conv_lateral[j](fp[j], train)
            if i > 0:
                up = self.conv_up[j](x, train)
                lat = lat + adaptive_avg_pool2d(up, (lat.shape[1], lat.shape[2]))
            x = lat
        return x

    def _sample(
        self, cond_latent: jnp.ndarray, latent_shape, rng, init_latent=None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Any]:
        """Full reverse diffusion as one scan; returns (latent, trajectory|None).

        ``init_latent`` (optional, NHWC f32) replaces the random starting
        latent - used by the golden-parity tests and the statistical eval
        protocol, where the latent must be controlled exactly (the reference
        starts from torch.randn, addHAHI.py:283, which is not reproducible
        across frameworks).

        The latent and all scheduler math stay float32 even under a bfloat16
        compute policy: ``1 - alpha_prod_t`` underflows to 0 in bf16 near t=0
        (8 mantissa bits), which poisons the epsilon re-derivation with
        inf/NaN. The denoiser's convs still run in bf16 via their dtype.
        """
        ts = (
            self.schedule.biased_timesteps(self.inference_steps)
            if self.timestep_schedule == "biased"
            else None
        )
        tables = self.schedule.inference_tables(self.inference_steps, ts)
        latent0 = (
            jnp.asarray(init_latent, jnp.float32)
            if init_latent is not None
            else jax.random.normal(rng, latent_shape, jnp.float32)
        )

        schedule = self.schedule
        vis = self.vis
        b, h, w, c = latent_shape

        # Memory layout of the scan matters enormously for training (grad
        # flows through all N steps, like the reference's backprop through
        # CNNDDIMPipiline):
        #  * the condition rides as a BROADCAST input, not a carry — carried,
        #    its per-step residuals cost steps x |cond| HBM (6 GB at the
        #    KITTI train crop)
        #  * fused Pallas path: latent AND condition live in the kernels'
        #    zero-border padded layout (B, H, Wp, C) for the WHOLE scan —
        #    cond is padded once out here (its pad used to run inside both
        #    the forward and the backward-recompute of every step) and the
        #    latent is never padded/sliced per step at all. Borders stay
        #    exactly zero: the kernels mask them and the DDIM update is
        #    purely multiplicative in (sample, eps). This removed ~100 ms of
        #    pad/slice/relayout HLO per bs4 train step (a 16-channel minor
        #    dim lane-pads 8x on TPU, so every materialized (B,H,W,16)
        #    intermediate cost 8x its logical bytes).
        #  * jnp path: the latent carry crosses the scan boundary flattened
        #    to (B, H, W*C) instead (same 8x-lane-padding argument, without
        #    kernels that need the spatial layout back).
        #  * remat strategy: with the fused Pallas denoiser active, the
        #    body is NOT remat'd — the denoiser's custom_vjp saves only
        #    (hoisted padded cond, per-step padded latent, te vector) and its
        #    backward recomputes its own intermediates, so full-body remat
        #    would just replay the forward chain a third time (~190 ms per
        #    train step at the flagship shape); only the scheduler update is
        #    checkpointed (its elementwise residuals are steps x eps-sized
        #    otherwise). The jnp denoiser path keeps full-body remat: its
        #    autodiff residuals are six 256-ch maps per step (~20 GB).
        fused = self.model.fused_active(h)

        xs = (tables.timesteps, tables.alpha_prod_t, tables.alpha_prod_prev)

        def sched_update(eps, x, a_t, a_prev):
            x_prev, _ = schedule.step_from_alphas(
                eps, x, a_t, a_prev,
                eta=0.0, use_clipped_model_output=True,
            )
            return x_prev

        if fused:
            from ...ops.fused_denoiser import (
                pad_w,
                padded_width,
                u4_stack_fits,
                u5_pad_stack_fits,
            )

            wp = padded_width(w)
            cond_p = pad_w(cond_latent.astype(jnp.bfloat16), wp)
            latent0_p = pad_w(latent0, wp)
            # static residual-HBM gate: the fused VJP's u4 stack is
            # steps x (B,H,Wp,256) bf16 — 3.12 GB at the flagship KITTI
            # train scan, which OOMs the accum-2 step (see fused_denoiser)
            save_u4 = u4_stack_fits(len(tables.timesteps), b, h, w)
            # u5 residual layout gate (padded = layout-natural dus, 2x HBM;
            # flat fallback above the budget) — see u5_pad_stack_fits
            save_u5p = u5_pad_stack_fits(len(tables.timesteps), b, h, w)

            # whole-step fusion (denoiser chain + DDIM update as ONE
            # custom_vjp, ops/fused_denoiser.py fused_sampler_step) is exact
            # only for the shipped scheduler configuration; anything else
            # falls back to the fused chain + the jnp scheduler below
            if schedule.prediction_type == "epsilon" and not schedule.clip_sample:
                # per-step [sqrt(a_t), sqrt(1-a_t), sqrt(a_prev),
                # sqrt(1-a_prev)], precomputed outside the scan
                scheds = jnp.stack(
                    [
                        jnp.sqrt(tables.alpha_prod_t),
                        jnp.sqrt(1.0 - tables.alpha_prod_t),
                        jnp.sqrt(tables.alpha_prod_prev),
                        jnp.sqrt(1.0 - tables.alpha_prod_prev),
                    ],
                    axis=1,
                ).astype(jnp.float32)

                if not train and (wp * c) % 128 == 0:
                    # EVAL: grouped-flat carry (fused_denoiser.py group16) —
                    # a single UNPADDED f32 latent instead of the padded
                    # (f32, bf16) pair. The padded 16-ch layout lane-pads 8x
                    # in HBM (2.05 ms/step in the scheduler kernel alone at
                    # the bs8 eval shape); the grouped layout packs 8 columns
                    # per 128-lane vector, the chain converts to bf16 on the
                    # XLA reshape into its padded input, and the DDIM update
                    # runs as a tiny unpadded Pallas kernel. Training keeps
                    # the pair path below: its custom_vjp residual layout and
                    # fused backward kernels are tuned for it.
                    from ...ops.fused_denoiser import (
                        flat_ddim_update,
                        group16,
                        ungroup16,
                    )

                    def step_fn(mdl, xg, cond_p, xs):
                        t, sched = xs
                        x_pb = ungroup16(xg, c).astype(jnp.bfloat16)
                        eps_p = mdl.model(
                            x_pb, t, cond_p, padded_w=w, save_u4=save_u4
                        )
                        xg = flat_ddim_update(group16(eps_p), xg, sched)
                        return xg, (
                            ungroup16(xg, c)[:, :, 1 : w + 1, :]
                            if vis else None
                        )

                    scan = nn.scan(
                        step_fn,
                        variable_broadcast=["params", "batch_stats"],
                        split_rngs={"params": False},
                        in_axes=(nn.broadcast, 0),
                        out_axes=0,
                    )
                    xg, traj = scan(
                        self, group16(latent0_p), cond_p,
                        (tables.timesteps, scheds),
                    )
                    return ungroup16(xg, c)[:, :, 1 : w + 1, :], traj

                def step_fn(mdl, carry, cond_p, xs):
                    t, sched = xs
                    xf, xb = carry
                    xf, xb = mdl.model.sampler_step(
                        xf, xb, t, cond_p, w, sched, save_u4=save_u4,
                        save_u5p=save_u5p,
                    )
                    return (xf, xb), (xf[:, :, 1 : w + 1, :] if vis else None)

                scan = nn.scan(
                    step_fn,
                    variable_broadcast=["params", "batch_stats"],
                    split_rngs={"params": False},
                    in_axes=(nn.broadcast, 0),
                    out_axes=0,
                )
                (latent_p, _), traj = scan(
                    self,
                    (latent0_p, latent0_p.astype(jnp.bfloat16)),
                    cond_p,
                    (tables.timesteps, scheds),
                )
                return latent_p[:, :, 1 : w + 1, :], traj

            sched_ckpt = jax.checkpoint(sched_update)

            def step_fn(mdl, x_p, cond_p, xs):
                t, a_t, a_prev = xs
                eps = mdl.model(
                    x_p, t, cond_p, padded_w=w, save_u4=save_u4,
                    save_u5p=save_u5p,
                ).astype(jnp.float32)
                x_prev = sched_ckpt(eps, x_p, a_t, a_prev)
                return x_prev, (x_prev[:, :, 1 : w + 1, :] if vis else None)

            scan = nn.scan(
                step_fn,
                variable_broadcast=["params", "batch_stats"],
                split_rngs={"params": False},
                in_axes=(nn.broadcast, 0),
                out_axes=0,
            )
            latent_p, traj = scan(self, latent0_p, cond_p, xs)
            return latent_p[:, :, 1 : w + 1, :], traj

        def step_fn(mdl, x_flat, cond, xs):
            t, a_t, a_prev = xs
            x = x_flat.reshape(latent_shape)
            eps = mdl.model(x, t, cond).astype(jnp.float32)
            x_prev = sched_update(eps, x, a_t, a_prev)
            return x_prev.reshape(b, h, w * c), (x_prev if vis else None)

        scan = nn.scan(
            nn.remat(step_fn, prevent_cse=False),
            variable_broadcast=["params", "batch_stats"],
            split_rngs={"params": False},
            in_axes=(nn.broadcast, 0),
            out_axes=0,
        )
        latent_flat, traj = scan(
            self,
            latent0.reshape(b, h, w * c),
            cond_latent,
            xs,
        )
        return latent_flat.reshape(latent_shape), traj

    def _ddim_loss(self, refined_latent: jnp.ndarray, cond_latent: jnp.ndarray) -> jnp.ndarray:
        """Self-diffusion noise-regression loss (reference :207-223)."""
        b = refined_latent.shape[0]
        rng_noise = self.make_rng("diffusion")
        rng_t = self.make_rng("diffusion")
        noise = jax.random.normal(rng_noise, refined_latent.shape, refined_latent.dtype)
        timesteps = jax.random.randint(rng_t, (b,), 0, self.num_train_timesteps)
        noisy = self.schedule.add_noise(refined_latent, noise, timesteps)
        if self.model.fused_active(noisy.shape[1]):
            # padded-entry call: the padded bf16 condition here is the SAME
            # expression the fused sampling scan hoists (pad_w of the bf16
            # cond), so XLA CSEs it — the unpadded entry would instead pad
            # cond inside both its forward and its backward recompute
            from ...ops.fused_denoiser import pad_w, padded_width

            w = noisy.shape[2]
            wp = padded_width(w)
            cond_p = pad_w(cond_latent.astype(jnp.bfloat16), wp)
            noisy_p = pad_w(noisy.astype(jnp.bfloat16), wp)
            noise_pred = self.model(
                noisy_p, timesteps, cond_p, padded_w=w
            )[:, :, 1 : w + 1, :]
        else:
            noise_pred = self.model(noisy, timesteps, cond_latent)
        return jnp.mean(jnp.square(noise_pred.astype(jnp.float32) - noise.astype(jnp.float32)))

    # ------------------------------------------------------------------ #
    def __call__(
        self,
        fp: Sequence[jnp.ndarray],
        depth_map: Optional[jnp.ndarray] = None,
        depth_mask: Optional[jnp.ndarray] = None,
        gt_depth_map: Optional[jnp.ndarray] = None,
        train: bool = False,
        compute_ddim_loss: Optional[bool] = None,
        init_latent: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        if compute_ddim_loss is None:
            compute_ddim_loss = train
        assert gt_depth_map is not None, (
            "gt_depth_map sizes the sampling latent (reference quirk, "
            "ddim_depth_estimate_res_swin_addHAHI.py:134); pass zeros at pure inference"
        )

        gt_map_t = self.depth_transform.t(gt_depth_map, train)

        if self.use_hahi:
            fp = self.hahineck(fp, train)
        cond = self._fpn_condition(fp, train)
        cond_latent = self.model.upsample_condition(cond, gt_map_t.shape[1:3])

        latent_shape = (
            gt_map_t.shape[0], gt_map_t.shape[1], gt_map_t.shape[2], self.depth_feature_dim
        )
        rng = (
            self.make_rng("diffusion") if init_latent is None
            else jax.random.PRNGKey(0)
        )
        refined_latent, traj = self._sample(
            cond_latent, latent_shape, rng, init_latent=init_latent,
            train=train,
        )
        refined_depth = self.depth_transform.inv_t(refined_latent, train)

        ddim_loss = (
            self._ddim_loss(refined_latent, cond_latent) if compute_ddim_loss else None
        )

        pred_inter = None
        if self.vis and traj is not None:
            # decode every intermediate latent (batched over the step axis)
            n, b, h, w, c = traj.shape
            flat = traj.reshape(n * b, h, w, c)
            pred_inter = self.depth_transform.inv_t(flat, False).reshape(n, b, h, w, 1)

        return {
            "pred": refined_depth,
            "pred_init": gt_map_t,
            "blur_depth_t": gt_map_t,
            "ddim_loss": ddim_loss,
            "gt_map_t": gt_map_t,
            "pred_uncertainty": None,
            "pred_inter": pred_inter,
            "weight_map": None,
            "guidance": None,
            "offset": None,
            "aff": None,
            "gamma": None,
            "confidence": None,
        }


# ---------------------------------------------------------------------- #
# Registered variants (reference files under src/model/head/)
# ---------------------------------------------------------------------- #


@HEADS.register_module()
class DDIMDepthEstimate_Res(DDIMDepthEstimateHead):
    """ResNet condition at latent resolution; direct-add fusion
    (reference: src/model/head/ddim_depth_estimate_res.py:15)."""

    in_channels: Sequence[int] = (64, 128, 256, 512)
    fuse: str = "add"


@HEADS.register_module()
class DDIMDepthEstimate_ResVis(DDIMDepthEstimate_Res):
    """Res variant returning per-step decoded depths
    (reference: src/model/head/ddim_depth_estimate_res_vis.py)."""

    vis: bool = True


@HEADS.register_module()
class DDIMDepthEstimate_Swin_ADD(DDIMDepthEstimateHead):
    """Swin-L pyramid; upsample-add fusion
    (reference: src/model/head/ddim_depth_estimate_res_swin_add.py:15)."""

    in_channels: Sequence[int] = (192, 384, 768, 1536)
    fuse: str = "upsample_add"


@HEADS.register_module()
class DDIMDepthEstimate_Swin_ADDHAHI(DDIMDepthEstimate_Swin_ADD):
    """Swin-L + HAHI neck (reference: ..._swin_addHAHI.py:16; the shipped
    config constructs HAHI with self_att=False, cross_att=False, :54-56)."""

    use_hahi: bool = True


@HEADS.register_module()
class DDIMDepthEstimate_Swin_ADDHAHIVis(DDIMDepthEstimate_Swin_ADDHAHI):
    """Vis variant (reference: ..._swin_addHAHI_vis.py:289-306)."""

    vis: bool = True


@HEADS.register_module()
class DDIMDepthEstimate_MPVIT_ADDHAHI(DDIMDepthEstimateHead):
    """MPViT-small pyramid + HAHI (reference: ..._mpvit_HAHI.py:32)."""

    in_channels: Sequence[int] = (128, 216, 288, 288)
    fuse: str = "upsample_add"
    use_hahi: bool = True


@HEADS.register_module()
class DDIMDepthEstimate_Swin(DDIMDepthEstimateHead):
    """'bins' experiment head: Swin pyramid, AdaBins concat-fusion denoiser
    (reference: src/model/head/ddim_depth_estimate_res_swin_bins.py:15 -
    NOT exported by the reference's head/__init__.py; provided for the full
    capability surface)."""

    in_channels: Sequence[int] = (192, 384, 768, 1536)
    fuse: str = "upsample_concat"


@HEADS.register_module()
class DDIMDepthEstimate_Swin_Bins_ADDVis(DDIMDepthEstimate_Swin):
    """Vis variant of the bins experiment head
    (reference: ..._swin_bins_add_vis.py:15, unregistered extra)."""

    vis: bool = True
