"""BaseSummary: accumulate per-batch loss/metric rows, write epoch means.

File contract matches the reference BaseSummary (src/summary/__init__.py:33-75):
``loss_{mode}.txt`` / ``metric_{mode}.txt`` are truncated at construction and
appended one line per epoch. Scalars land both in a grep-able jsonl history
and in real TensorBoard event files (one per-mode writer, like the
reference's ``SummaryWriter(log_dir=.../mode)``), written by the
dependency-free encoder in ``tb_events.py``.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from .tb_events import EventFileWriter


class BaseSummary:
    def __init__(self, log_dir: str, mode: str, args):
        self.log_dir = log_dir
        self.mode = mode
        self.args = args

        os.makedirs(log_dir, exist_ok=True)
        os.makedirs(os.path.join(log_dir, mode), exist_ok=True)

        self.loss = []
        self.metric = []

        self.f_loss = os.path.join(log_dir, f"loss_{mode}.txt")
        self.f_metric = os.path.join(log_dir, f"metric_{mode}.txt")
        self.f_scalars = os.path.join(log_dir, f"scalars_{mode}.jsonl")
        open(self.f_loss, "w").close()
        open(self.f_metric, "w").close()
        open(self.f_scalars, "w").close()
        self.writer = EventFileWriter(os.path.join(log_dir, mode))

    # ------------------------------------------------------------- scalars
    def add_scalar(self, tag: str, value: float, step: int):
        with open(self.f_scalars, "a") as f:
            f.write(json.dumps({"step": int(step), "tag": tag,
                                "value": float(value)}) + "\n")
        self.writer.add_scalar(tag, value, step)

    def add_image(self, tag: str, image: np.ndarray, step: int):
        """HWC uint8 image summary (reference add_image, NCHW there)."""
        self.writer.add_image(tag, image, step)

    def flush(self):
        self.writer.flush()

    # -------------------------------------------------------------- accum
    def add(self, loss: Optional[np.ndarray] = None,
            metric: Optional[np.ndarray] = None):
        """Append one batch's (1, n) loss / metric row (numpy or jax arrays)."""
        if loss is not None:
            self.loss.append(np.asarray(loss))
        if metric is not None:
            self.metric.append(np.asarray(metric))

    def _mean(self, rows) -> Optional[np.ndarray]:
        if not rows:
            return None
        cat = np.concatenate(rows, axis=0)
        return np.mean(cat, axis=0, keepdims=True)

    def _format_line(self, kind: str, names: Sequence[str], vals: np.ndarray) -> str:
        """Reference line format (diffusion_dcbase_summary.py:40-52)."""
        msg = [" {:<9s}|  ".format(kind)]
        for idx, name in enumerate(names):
            msg += ["{:<s}: {:.4f}  ".format(name, float(vals[0, idx]))]
            if (idx + 1) % 10 == 0:
                msg += ["\n             "]
        return "".join(msg)

    def reset(self):
        self.loss = []
        self.metric = []
