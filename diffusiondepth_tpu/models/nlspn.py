"""NLSPN legacy depth-completion model (TPU-native).

Re-implements the reference NLSPN (src/model/nlspnmodel.py:22-366): a
resnet18/34 encoder-decoder producing initial depth + guidance + confidence,
followed by ``prop_time`` iterations of non-local spatial propagation. The
reference's propagation is a modulated-deformable-conv CUDA call per step
(:166-172); here the fixed per-pixel sampling pattern is compiled once into
a dense local stencil and each step is a gather-free shift-and-MAC
(ops/stencil_prop.py, ``--prop_stencil_radius``; radius 0 falls back to the
exact bilinear-gather ``modulated_deform_conv`` with a frozen all-ones
kernel), and the whole iteration stack is a ``lax.scan`` — one compiled
region, no per-step host sync.

Affinity machinery (reference _get_offset_affinity :88-164):
  * zero-init k_g x k_g conv emits (o1, o2, aff) chunks; taps get a zero
    reference offset inserted at the kernel centre
  * TGASS: aff = tanh(aff) / (gamma * num + 1e-8) with gamma trainable
  * confidence propagation: confidence bilinearly sampled at each tap's
    (stop-gradient) offset scales the affinity
  * abs-sum normalisation (clamped to >= 1 for ASS/TGASS), centre affinity
    = 1 - sum(others)

NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.deform_conv import modulated_deform_conv
from ..ops.stencil_prop import build_stencil, stencil_apply
from ..registry import MODELS
from .common import ConvBNAct, DeconvBNAct


class TorchBasicBlock(nn.Module):
    """torchvision-style BasicBlock (1x1-conv+BN downsample), used by the
    NLSPN encoder (reference get_resnet18/34 via torchvision, common.py)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from .common import BatchNorm

        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype)(x)
        out = nn.relu(BatchNorm(dtype=self.dtype)(out, train))
        out = nn.Conv(self.planes, (3, 3), padding=((1, 1), (1, 1)),
                      use_bias=False, dtype=self.dtype)(out)
        out = BatchNorm(dtype=self.dtype)(out, train)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(
                identity, train)
        return nn.relu(out + identity)


class ResNetStage(nn.Module):
    planes: int
    blocks: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        down = self.stride != 1 or x.shape[-1] != self.planes
        x = TorchBasicBlock(self.planes, self.stride, down, dtype=self.dtype,
                            name="block0")(x, train)
        for i in range(1, self.blocks):
            x = TorchBasicBlock(self.planes, dtype=self.dtype,
                                name=f"block{i}")(x, train)
        return x


class NLSPNPropagation(nn.Module):
    """Non-local spatial propagation (reference NLSPN :22-208)."""

    args: Any
    ch_g: int
    ch_f: int = 1
    k_g: int = 3
    k_f: int = 3
    dtype: Optional[Any] = None

    def setup(self):
        assert self.ch_f == 1
        assert self.k_g % 2 == 1 and self.k_f % 2 == 1
        self.num = self.k_f * self.k_f - 1
        self.idx_ref = self.num // 2
        affinity = self.args.affinity
        assert affinity in ("AS", "ASS", "TC", "TGASS")

        self.conv_offset_aff = nn.Conv(
            3 * self.num, (self.k_g, self.k_g),
            padding=(((self.k_g - 1) // 2,) * 2,) * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="conv_offset_aff",
        )
        if affinity == "TGASS":
            # trainable (reference :63-64)
            self.aff_scale_const = self.param(
                "aff_scale_const",
                lambda key, shape: jnp.full(
                    shape, self.args.affinity_gamma * self.num, jnp.float32
                ),
                (1,),
            )
        elif affinity == "TC":
            self.aff_scale_const = jnp.full((1,), float(self.num))
        else:
            self.aff_scale_const = jnp.ones((1,))

    def _get_offset_affinity(self, guidance, confidence, train: bool):
        b, h, w, _ = guidance.shape
        num = self.num
        affinity = self.args.affinity

        offset_aff = self.conv_offset_aff(guidance)
        o1 = offset_aff[..., 0 * num : 1 * num]
        o2 = offset_aff[..., 1 * num : 2 * num]
        aff = offset_aff[..., 2 * num : 3 * num]

        # cat(o1,o2) then pair-split — reproduces the reference's channel
        # wiring exactly (:94-96); it's learned, so the wiring just needs to
        # be consistent with checkpoints
        offset = jnp.concatenate([o1, o2], axis=-1).reshape(b, h, w, num, 2)
        zero_ref = jnp.zeros((b, h, w, 1, 2), offset.dtype)
        offset = jnp.concatenate(
            [offset[..., : self.idx_ref, :], zero_ref,
             offset[..., self.idx_ref :, :]], axis=3,
        )  # (B, H, W, num+1, 2)

        if affinity == "TC":
            aff = jnp.tanh(aff) / self.aff_scale_const
        elif affinity == "TGASS":
            aff = jnp.tanh(aff) / (jnp.abs(self.aff_scale_const) + 1e-8)

        if self.args.conf_prop and confidence is not None:
            # sample confidence at each non-centre tap's offset
            # (reference :116-146: K 1x1 deform convs with frozen unit weight)
            off_det = jax.lax.stop_gradient(offset)
            taps = [k for k in range(num + 1) if k != self.idx_ref]
            off_sample = off_det[:, :, :, jnp.asarray(taps), :]
            if self.args.legacy:
                # pre-ECCV20 checkpoints bake the tap displacement in (:128-134)
                disp = jnp.asarray(
                    [[hh - (self.k_f - 1) / 2, ww - (self.k_f - 1) / 2]
                     for k in taps
                     for hh, ww in [(k // self.k_f, k % self.k_f)]],
                    off_sample.dtype,
                )
                off_sample = off_sample + disp[None, None, None]
            ys = (jnp.arange(h)[None, :, None, None]
                  + off_sample[..., 0]).reshape(b, -1)
            xs = (jnp.arange(w)[None, None, :, None]
                  + off_sample[..., 1]).reshape(b, -1)
            from ..ops.msda import bilinear_sample_nhwc

            conf = bilinear_sample_nhwc(confidence, xs, ys)
            conf_aff = conf.reshape(b, h, w, num)
            aff = aff * conf_aff

        # affinity normalisation (:148-160)
        aff_abs_sum = jnp.sum(jnp.abs(aff), axis=-1, keepdims=True) + 1e-4
        if affinity in ("ASS", "TGASS"):
            aff_abs_sum = jnp.maximum(aff_abs_sum, 1.0)
        if affinity in ("AS", "ASS", "TGASS"):
            aff = aff / aff_abs_sum

        aff_ref = 1.0 - jnp.sum(aff, axis=-1, keepdims=True)
        aff = jnp.concatenate(
            [aff[..., : self.idx_ref], aff_ref, aff[..., self.idx_ref :]],
            axis=-1,
        )  # (B, H, W, num+1)
        return offset.reshape(b, h, w, (num + 1) * 2), aff

    def __call__(self, feat_init, guidance, confidence=None, feat_fix=None,
                 train: bool = False):
        offset, aff = self._get_offset_affinity(guidance, confidence, train)

        w_prop = jnp.ones((self.k_f, self.k_f, 1, self.ch_f), feat_init.dtype)
        pad = (self.k_f - 1) // 2

        preserve = self.args.preserve_input and feat_fix is not None
        if preserve:
            mask_fix = jax.lax.stop_gradient(
                (jnp.sum((feat_fix > 0.0).astype(feat_init.dtype), axis=-1,
                         keepdims=True) > 0.0).astype(feat_init.dtype)
            )

        # The offsets/affinities are FIXED across the prop_time iterations,
        # so by default they are compiled ONCE into a dense local stencil and
        # each iteration is a gather-free shift-and-MAC (ops/stencil_prop.py;
        # ~100x the XLA gather path on TPU, exact for |offset| <= radius).
        # radius 0 keeps the reference-exact bilinear gather.
        radius = int(getattr(self.args, "prop_stencil_radius", 0) or 0)
        use_stencil = radius > 0 and self.ch_f == 1
        if use_stencil:
            stencil = build_stencil(offset, aff, radius,
                                    dtype=jnp.promote_types(feat_init.dtype,
                                                            jnp.float32))

        def step(feat, _):
            if preserve:
                feat = (1.0 - mask_fix) * feat + mask_fix * feat_fix
            if use_stencil:
                feat = stencil_apply(stencil, feat, radius)
            else:
                feat = modulated_deform_conv(
                    feat, offset, aff, w_prop, stride=1, padding=pad,
                    dilation=1, groups=self.ch_f, deformable_groups=1,
                )
            return feat, feat

        feat_result, inter = jax.lax.scan(
            step, feat_init, None, length=self.args.prop_time
        )
        return feat_result, inter, offset, aff, self.aff_scale_const


@MODELS.register(name="NLSPNModel")
class NLSPNModel(nn.Module):
    """Reference NLSPNModel (:210-366): U-Net over (rgb, sparse depth) with
    init-depth / guidance / confidence heads + NLSPN propagation."""

    args: Any
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, sample: Dict, train: bool = False) -> Dict:
        args = self.args
        rgb, dep = sample["rgb"], sample["dep"]
        num_neighbors = args.prop_kernel * args.prop_kernel - 1
        blocks = {"resnet18": (2, 2, 2, 2), "resnet34": (3, 4, 6, 3)}[args.network]
        dt = self.dtype

        c = lambda f, k, s, p, bn=True, act="leaky_relu", name=None: ConvBNAct(
            f, k, s, p, use_bn=bn, act=act, dtype=dt, name=name)
        t = lambda f, name: DeconvBNAct(f, kernel_size=3, strides=2,
                                        act="leaky_relu", dtype=dt, name=name)

        fe1_rgb = c(48, 3, 1, 1, bn=False, name="conv1_rgb")(rgb, train)
        fe1_dep = c(16, 3, 1, 1, bn=False, name="conv1_dep")(dep, train)
        fe1 = jnp.concatenate([fe1_rgb, fe1_dep], axis=-1)

        fe2 = ResNetStage(64, blocks[0], 1, dtype=dt, name="conv2")(fe1, train)
        fe3 = ResNetStage(128, blocks[1], 2, dtype=dt, name="conv3")(fe2, train)
        fe4 = ResNetStage(256, blocks[2], 2, dtype=dt, name="conv4")(fe3, train)
        fe5 = ResNetStage(512, blocks[3], 2, dtype=dt, name="conv5")(fe4, train)
        fe6 = c(512, 3, 2, 1, name="conv6")(fe5, train)

        def concat(fd, fe):
            # crop decoder padding overshoot (reference _concat :302-318)
            fd = fd[:, : fe.shape[1], : fe.shape[2], :]
            return jnp.concatenate([fd, fe], axis=-1)

        fd5 = t(256, "dec5")(fe6, train)
        fd4 = t(128, "dec4")(concat(fd5, fe5), train)
        fd3 = t(64, "dec3")(concat(fd4, fe4), train)
        fd2 = t(64, "dec2")(concat(fd3, fe3), train)

        id_fd1 = c(64, 3, 1, 1, name="id_dec1")(concat(fd2, fe2), train)
        # conv_bn_relu(relu=True) is LeakyReLU(0.2), not ReLU
        # (reference common.py:55-56, nlspnmodel.py:264-265)
        pred_init = c(1, 3, 1, 1, bn=False, act="leaky_relu", name="id_dec0")(
            concat(id_fd1, fe1), train)

        gd_fd1 = c(64, 3, 1, 1, name="gd_dec1")(concat(fd2, fe2), train)
        guide = c(num_neighbors, 3, 1, 1, bn=False, act=None, name="gd_dec0")(
            concat(gd_fd1, fe1), train)

        confidence = None
        if args.conf_prop:
            cf_fd1 = c(32, 3, 1, 1, name="cf_dec1")(concat(fd2, fe2), train)
            confidence = c(1, 3, 1, 1, bn=False, act="sigmoid", name="cf_dec0")(
                concat(cf_fd1, fe1), train)

        prop = NLSPNPropagation(
            args=args, ch_g=num_neighbors, ch_f=1, k_g=3, k_f=args.prop_kernel,
            dtype=dt, name="prop_layer",
        )
        y, y_inter, offset, aff, aff_const = prop(
            pred_init, guide, confidence, dep, train)
        y = jnp.clip(y, 0.0, None)

        return {
            "pred": y,
            "pred_init": pred_init,
            "pred_inter": y_inter,
            "guidance": guide,
            "offset": offset,
            "aff": aff,
            "gamma": aff_const,
            "confidence": confidence,
            "ddim_loss": None,
            "gt_map_t": None,
            "blur_depth_t": None,
            "pred_uncertainty": None,
            "weight_map": None,
        }
