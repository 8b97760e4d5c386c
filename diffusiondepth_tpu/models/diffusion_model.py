"""Composed DiffusionDepth model: backbone + DDIM head.

Re-implements ``Diffusion_DCbase_Model`` (reference:
src/model/diffusion_dcbase_model.py:25-224): unpack the sample dict, run the
visual-condition backbone, hand the pyramid + depth maps to the DDIM head.

The factory :func:`get_model` mirrors the reference plugin convention of
resolving ``args.model_name + 'Model'`` (reference: src/model/__init__.py:17-23).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from ..registry import BACKBONES, HEADS, MODELS
from . import backbones  # noqa: F401  (registers resnet variants)
from . import heads  # noqa: F401  (registers head variants)

# Default head per backbone family when --head_specify is omitted. (The
# reference's fallback cfg names a nonexistent 'DDIMDepthRefine2' type,
# diffusion_dcbase_model.py:30 - i.e. head_specify is de facto required; we
# default to the Res head instead of crashing.)
_DEFAULT_HEAD = {
    "mmbev_resnet": "DDIMDepthEstimate_Res",
    "swin": "DDIMDepthEstimate_Swin_ADDHAHI",
    "mpvit": "DDIMDepthEstimate_MPVIT_ADDHAHI",
}


@MODELS.register_module()
class Diffusion_DCbase_Model(nn.Module):
    backbone_name: str = "mmbev_res18"
    backbone_module: str = "mmbev_resnet"
    head_name: str = "DDIMDepthEstimate_Res"
    inference_steps: int = 20
    num_train_timesteps: int = 1000
    timestep_schedule: str = "uniform"
    depth_transform_cfg: Optional[Any] = None
    # Override the head's pyramid channel spec (each registered head fixes the
    # channels of its reference backbone, e.g. Swin-L (192,...,1536); this lets
    # smaller backbones of the same family reuse the head, e.g. swin_tiny in
    # the multi-chip dryrun).
    head_in_channels: Optional[Any] = None
    # Route Swin window attention through the fused Pallas kernel (opt-in;
    # measured SLOWER than XLA at the flagship shapes - see
    # tools/bench_window_attention.py and ops/window_attention.py docstring)
    use_pallas: bool = False
    # v3 fused-input window-attention kernel at inference (default ON;
    # measured 1.37-1.66x XLA at every flagship stage shape,
    # tools/bench_window_attention_v3.py)
    fused_window_attention: bool = True
    # Rematerialise Swin blocks under grad. True = fits Swin-L training at
    # micro-batch 8 in 16 GB HBM; False trades memory for skipping the remat
    # re-forward (faster when the micro-batch leaves HBM headroom, e.g.
    # accumulated micro-batch 4).
    remat_backbone: bool = True
    # fused Pallas denoiser conv chain (2x the XLA lowering on v5e; see
    # ops/fused_denoiser.py). Safe everywhere: per-call guards fall back to
    # the jnp path when shape/dtype/schedule conditions do not hold.
    use_fused_denoiser: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        bb_kwargs = {}
        if self.backbone_module == "swin":
            from .backbones import swin  # noqa: F401

            bb_kwargs["use_pallas"] = self.use_pallas
            bb_kwargs["remat"] = self.remat_backbone
            bb_kwargs["fused_qkv_attention"] = self.fused_window_attention
        elif self.backbone_module == "mpvit":
            from .backbones import mpvit  # noqa: F401
        self.depth_backbone = BACKBONES.get(self.backbone_name)(
            dtype=self.dtype, **bb_kwargs)
        head_cls = HEADS.get(self.head_name)
        kwargs = {}
        if self.depth_transform_cfg is not None:
            kwargs["depth_transform_cfg"] = self.depth_transform_cfg
        if self.head_in_channels is not None:
            kwargs["in_channels"] = tuple(self.head_in_channels)
        self.depth_head = head_cls(
            inference_steps=self.inference_steps,
            num_train_timesteps=self.num_train_timesteps,
            timestep_schedule=self.timestep_schedule,
            use_fused_denoiser=self.use_fused_denoiser,
            dtype=self.dtype,
            **kwargs,
        )

    def __call__(
        self,
        sample: Dict[str, jnp.ndarray],
        train: bool = False,
        compute_ddim_loss: Optional[bool] = None,
        init_latent: Optional[jnp.ndarray] = None,
    ) -> Dict[str, Any]:
        """sample keys (NHWC): rgb (B,H,W,3), dep, gt, depth_map, depth_mask
        (reference forward contract: diffusion_dcbase_model.py:186-224).
        ``init_latent`` optionally fixes the sampler's starting latent
        (parity tests / seed-controlled eval)."""
        img = sample["rgb"]
        gt = sample.get("gt")
        depth_map = sample.get("depth_map")
        depth_mask = sample.get("depth_mask")

        fp = self.depth_backbone(img, train)
        return self.depth_head(
            fp,
            depth_map=depth_map,
            depth_mask=depth_mask,
            gt_depth_map=gt,
            train=train,
            compute_ddim_loss=compute_ddim_loss,
            init_latent=init_latent,
        )


def build_model(cfg) -> nn.Module:
    """Build the flagship model from a :class:`~diffusiondepth_tpu.config.Config`."""
    if cfg.model_name in ("Diffusion_DCbase_", "Diffusion_DCx4base_"):
        head = cfg.head_specify or _DEFAULT_HEAD[cfg.backbone_module]
        # x4 variant: same composition with the X4 (1/4-res latent) depth
        # transform. The reference's x4 model module is unresolvable in the
        # shipped tree (SURVEY.md 2.7); this is the working equivalent.
        dt_cfg = (
            dict(type="DeepDepthTransformWithUpsamplingX4", hidden=16, eps=1e-6)
            if cfg.model_name == "Diffusion_DCx4base_"
            else None
        )
        hic = getattr(cfg, "head_in_channels", None)
        if isinstance(hic, str):
            hic = tuple(int(c) for c in hic.split(","))
        return Diffusion_DCbase_Model(
            backbone_name=cfg.backbone_name,
            backbone_module=cfg.backbone_module,
            head_name=head,
            inference_steps=cfg.inference_steps,
            num_train_timesteps=cfg.num_train_timesteps,
            timestep_schedule=cfg.timestep_schedule,
            depth_transform_cfg=dt_cfg,
            head_in_channels=hic,
            use_pallas=bool(getattr(cfg, "use_pallas", False))
            and cfg.backbone_module == "swin",
            fused_window_attention=bool(
                getattr(cfg, "fused_window_attention", True)),
            remat_backbone=bool(getattr(cfg, "remat_backbone", True)),
            use_fused_denoiser=bool(getattr(cfg, "fused_denoiser", True)),
            dtype=cfg.compute_dtype if cfg.dtype == "bfloat16" else None,
        )
    if cfg.model_name == "NLSPN":
        from .nlspn import NLSPNModel

        return NLSPNModel(
            args=cfg,
            dtype=cfg.compute_dtype if cfg.dtype == "bfloat16" else None,
        )
    raise ValueError(f"unknown model_name {cfg.model_name!r}")


def get_model(args):
    """Reference-style factory: resolve by ``args.model_name`` and return a
    constructor taking ``args`` (reference: src/model/__init__.py:17-23)."""
    return lambda a=args: build_model(a)
