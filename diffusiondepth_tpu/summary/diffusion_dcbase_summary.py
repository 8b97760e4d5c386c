"""Diffusion_DCbase_ summary writer.

Reference: src/summary/diffusion_dcbase_summary.py.

``update``  - epoch roll-up: means of accumulated loss/metric rows, text +
jsonl scalars, and a composite image strip (rgb | sparse | pred | gt |
confidence) colormapped with plasma, saved as a PNG under
``{log_dir}/{mode}/images`` (replacing add_image; reference :35-164).

``save``    - per-sample artifacts (reference :166-318):
  * ``save_result_only``: KITTI-submission ``uint16(pred*256)`` PNG, plus raw
    ``.npy`` when ``save_raw_npdepth`` (reference :176-186)
  * otherwise a panel directory with rgb / dep / pred / gt PNGs.

Batches are NHWC numpy dicts (the TPU pipeline's layout).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
from PIL import Image

from ..losses import get_loss_names
from ..metrics import METRIC_NAMES
from ..ops.vis import colormap_255
from .base import BaseSummary

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _slice_sample(arr: np.ndarray, b: int, batch: int) -> np.ndarray:
    """Pick sample ``b`` from an output tensor: batch-leading ``(B, ...)``
    entries slice on axis 0, scan-stacked ``(T, B, ...)`` entries (NLSPN
    pred_inter) on axis 1, batch-free entries (gamma ``(1,)``) pass through."""
    if arr.ndim >= 1 and arr.shape[0] == batch:
        return arr[b]
    if arr.ndim >= 2 and arr.shape[1] == batch:
        return arr[:, b]
    return arr


class Diffusion_DCbase_Summary(BaseSummary):
    def __init__(self, log_dir: str, mode: str, args,
                 loss_name=None, metric_name=None):
        super().__init__(log_dir, mode, args)
        self.loss_name = loss_name or get_loss_names(args)
        self.metric_name = metric_name or list(METRIC_NAMES)
        self.path_output = None

    # -------------------------------------------------------------- update
    def update(self, global_step: int, sample: Optional[Dict] = None,
               output: Optional[Dict] = None):
        loss_mean = self._mean(self.loss)
        if loss_mean is not None and self.loss_name:
            msg = self._format_line("Loss", self.loss_name, loss_mean)
            for i, name in enumerate(self.loss_name):
                self.add_scalar("Loss/" + name, loss_mean[0, i], global_step)
            print(msg)
            with open(self.f_loss, "a") as f:
                f.write("{:04d} | {}\n".format(global_step, msg))

        metric_mean = self._mean(self.metric)
        if metric_mean is not None:
            msg = self._format_line("Metric", self.metric_name, metric_mean)
            for i, name in enumerate(self.metric_name):
                self.add_scalar("Metric/" + name, metric_mean[0, i], global_step)
            print(msg)
            with open(self.f_metric, "a") as f:
                f.write("{:04d} | {}\n".format(global_step, msg))

        if sample is not None and output is not None:
            try:
                self._write_panel(global_step, sample, output)
            except Exception as e:  # panels are best-effort observability
                print(f"[summary] panel write failed: {e}")

        result = metric_mean
        self.flush()
        self.reset()
        return result

    def _write_panel(self, global_step: int, sample: Dict, output: Dict):
        rgb = np.asarray(sample["rgb"], np.float32)
        rgb = np.clip(rgb * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
        dep = np.clip(np.asarray(sample["dep"], np.float32), 0, self.args.max_depth)
        gt = np.clip(np.asarray(sample["gt"], np.float32), 0, self.args.max_depth)
        pred = np.clip(np.asarray(output["pred"], np.float32), 0, self.args.max_depth)

        n = min(rgb.shape[0], self.args.num_summary)
        rows = []
        for b in range(n):
            cols = [rgb[b]]
            for m in (dep[b, ..., 0], pred[b, ..., 0], gt[b, ..., 0]):
                cols.append(colormap_255(255.0 * m / self.args.max_depth))
            rows.append(np.concatenate(cols, axis=1))
        panel = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)

        img_dir = os.path.join(self.log_dir, self.mode, "images")
        os.makedirs(img_dir, exist_ok=True)
        Image.fromarray(panel).save(
            os.path.join(img_dir, f"step_{global_step:06d}.png")
        )
        # reference tag (diffusion_dcbase_summary.py:155)
        self.add_image(self.mode + "/images", panel, global_step)

    # ---------------------------------------------------------------- save
    def make_dir(self, epoch: int, idx: int):
        if self.args.save_result_only:
            self.path_output = os.path.join(
                self.log_dir, self.mode, f"epoch{epoch:04d}"
            )
        else:
            self.path_output = os.path.join(
                self.log_dir, self.mode, f"epoch{epoch:04d}", f"{idx:08d}"
            )
        os.makedirs(self.path_output, exist_ok=True)

    def save(self, epoch: int, idx: int, sample: Dict, output: Dict):
        """Write per-sample artifacts for EVERY element of the batch.

        ``idx`` is the dataset index of the batch's FIRST sample; sample ``b``
        of the batch is written as dataset index ``idx + b``. The reference
        evaluated at batch size 1, so its per-batch index was the dataset
        index (src/main.py:408-411, summary :166-186); this generalisation
        keeps filenames identical at bs=1 and loses no samples at the batched
        eval sizes this framework adds (``--test_batch_size``).

        Output-dict entries beyond ``pred`` (e.g. NLSPN's propagation
        internals) are sliced per sample and forwarded to ``_save_one``."""
        preds = np.clip(np.asarray(output["pred"], np.float32)[..., 0], 0, None)
        n = preds.shape[0]
        extras_all = {k: np.asarray(v) for k, v in output.items()
                      if k != "pred" and v is not None}
        for b in range(n):
            extras = {k: _slice_sample(v, b, n) for k, v in extras_all.items()}
            self._save_one(
                epoch,
                idx + b,
                {k: np.asarray(v)[b] for k, v in sample.items()
                 if hasattr(v, "ndim") and getattr(v, "ndim", 0) >= 1},
                preds[b],
                extras or None,
            )

    def _save_one(self, epoch: int, idx: int, sample: Dict, pred: np.ndarray,
                  extras=None):
        self.make_dir(epoch, idx)
        if self.args.save_result_only:
            # KITTI submission format (reference :176-186)
            path = os.path.join(self.path_output, f"{idx:010d}.png")
            Image.fromarray((pred * 256.0).astype(np.uint16)).save(path)
            if self.args.save_raw_npdepth:
                np.save(os.path.join(self.path_output, f"{idx:010d}.npy"), pred)
            return

        rgb = np.asarray(sample["rgb"], np.float32)
        rgb = np.clip(rgb * IMAGENET_STD + IMAGENET_MEAN, 0.0, 1.0)
        dep = np.asarray(sample["dep"], np.float32)[..., 0]
        gt = np.asarray(sample["gt"], np.float32)[..., 0]

        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(self.path_output, "01_rgb.png")
        )
        for name, m in (("02_dep", dep), ("03_pred", pred), ("04_gt", gt)):
            img = colormap_255(255.0 * np.clip(m, 0, self.args.max_depth)
                               / self.args.max_depth)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(self.path_output, f"{name}.png")
            )
        if self.args.save_raw_npdepth:
            np.save(os.path.join(self.path_output, "pred.npy"), pred)
