"""NLSPN summary writer (reference: src/summary/nlspnsummary.py).

Shares the accumulate/mean/text pipeline with Diffusion_DCbase_Summary and
adds the NLSPN-specific observability surface:

``update``  - the epoch panel gains a confidence strip (reference :102-148)
and an ``Etc/gamma`` scalar (the learned affinity-scale constant,
reference :157).

``save``    - reference :165-267: ``save_result_only`` keeps the inherited
KITTI-submission uint16 PNG; otherwise a per-sample panel directory with the
reference's file names (01_rgb / 02_dep / 03_pred_init / 04_pred_prop_k /
05_pred_final(+gray) / 06_gt) plus raw ``guidance`` / ``offset`` / ``aff`` /
``gamma`` ``.npy`` dumps of the propagation internals.

``SAVE_KEYS`` names the model-output entries the runtime must fetch from the
eval step for these artifacts (training/steps.py ``extra_keys``).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from ..ops.vis import colormap_255
from .diffusion_dcbase_summary import (
    Diffusion_DCbase_Summary,
    IMAGENET_MEAN,
    IMAGENET_STD,
)


class NLSPNSummary(Diffusion_DCbase_Summary):
    SAVE_KEYS = ("guidance", "offset", "aff", "gamma", "confidence",
                 "pred_init", "pred_inter")

    # ------------------------------------------------------------- update
    def update(self, global_step: int, sample: Optional[Dict] = None,
               output: Optional[Dict] = None):
        if output is not None and "gamma" in output:
            # learned affinity scale (reference nlspnsummary.py:157)
            self.add_scalar("Etc/gamma",
                            float(np.ravel(output["gamma"])[0]), global_step)
        return super().update(global_step, sample, output)

    def _write_panel(self, global_step: int, sample: Dict, output: Dict):
        """rgb | dep | pred | gt | confidence strip (reference :123-155)."""
        rgb = np.asarray(sample["rgb"], np.float32)
        rgb = np.clip(rgb * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
        dep = np.clip(np.asarray(sample["dep"], np.float32), 0, self.args.max_depth)
        gt = np.clip(np.asarray(sample["gt"], np.float32), 0, self.args.max_depth)
        pred = np.clip(np.asarray(output["pred"], np.float32), 0, self.args.max_depth)
        conf = output.get("confidence")
        conf = (np.clip(np.asarray(conf, np.float32), 0.0, 1.0)
                if conf is not None else np.zeros_like(dep))

        n = min(rgb.shape[0], self.args.num_summary)
        rows = []
        for b in range(n):
            cols = [rgb[b]]
            for m in (dep[b, ..., 0] / self.args.max_depth,
                      pred[b, ..., 0] / self.args.max_depth,
                      gt[b, ..., 0] / self.args.max_depth,
                      conf[b, ..., 0]):
                cols.append(colormap_255(255.0 * m))
            rows.append(np.concatenate(cols, axis=1))
        panel = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)

        img_dir = os.path.join(self.log_dir, self.mode, "images")
        os.makedirs(img_dir, exist_ok=True)
        Image.fromarray(panel).save(
            os.path.join(img_dir, f"step_{global_step:06d}.png")
        )
        self.add_image(self.mode + "/images", panel, global_step)

    # --------------------------------------------------------------- save
    def _save_one(self, epoch: int, idx: int, sample: Dict, pred: np.ndarray,
                  extras: Optional[Dict] = None):
        if self.args.save_result_only:
            return super()._save_one(epoch, idx, sample, pred, extras)
        self.make_dir(epoch, idx)
        extras = extras or {}

        rgb = np.asarray(sample["rgb"], np.float32)
        rgb = np.clip(rgb * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(self.path_output, "01_rgb.png")
        )

        def depth_png(name: str, m: np.ndarray):
            img = colormap_255(
                255.0 * np.clip(m, 0, self.args.max_depth) / self.args.max_depth
            )
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(self.path_output, name)
            )

        depth_png("02_dep.png", np.asarray(sample["dep"], np.float32)[..., 0])
        if "pred_init" in extras:
            depth_png("03_pred_init.png", extras["pred_init"][..., 0])
        if "pred_inter" in extras:
            # (prop_time, H, W, 1) per-iteration propagation snapshots
            for k in range(extras["pred_inter"].shape[0]):
                depth_png(f"04_pred_prop_{k:02d}.png",
                          extras["pred_inter"][k, ..., 0])
        depth_png("05_pred_final.png", pred)
        gray = (255.0 * np.clip(pred / self.args.max_depth, 0, 1)).astype(np.uint8)
        Image.fromarray(gray).save(
            os.path.join(self.path_output, "05_pred_final_gray.png")
        )
        depth_png("06_gt.png", np.asarray(sample["gt"], np.float32)[..., 0])

        for key in ("guidance", "offset", "aff", "gamma"):
            if key in extras:
                np.save(os.path.join(self.path_output, f"{key}.npy"),
                        extras[key])
        if self.args.save_raw_npdepth:
            np.save(os.path.join(self.path_output, "pred.npy"), pred)
