"""Sine positional encoding (DETR-style).

Re-implements mmcv's ``SinePositionalEncoding`` as built by the HAHI neck
(reference: src/model/necks/hahi.py:103-104 with
dict(type='SinePositionalEncoding', num_feats=256); vendored math also in
src/model/utils/positional_encoding.py:52-87). Parameter-free; returns
(H, W, 2*num_feats) for an all-valid mask (the reference always passes
zero masks, hahi.py:188).
"""

from __future__ import annotations

import functools

import numpy as np


@functools.lru_cache(maxsize=None)
def sine_positional_encoding(
    h: int,
    w: int,
    num_feats: int = 256,
    temperature: float = 10000.0,
    normalize: bool = False,
    scale: float = 2.0 * np.pi,
    eps: float = 1e-6,
    offset: float = 0.0,
) -> np.ndarray:
    """Static (trace-time) sine PE; numpy, cached."""
    y_embed = np.tile(np.arange(1, h + 1, dtype=np.float32)[:, None], (1, w))
    x_embed = np.tile(np.arange(1, w + 1, dtype=np.float32)[None, :], (h, 1))
    if normalize:
        y_embed = (y_embed + offset) / (y_embed[-1:, :] + eps) * scale
        x_embed = (x_embed + offset) / (x_embed[:, -1:] + eps) * scale
    dim_t = temperature ** (
        2 * (np.arange(num_feats, dtype=np.float32) // 2) / num_feats
    )
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin on even dims, cos on odd dims
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], -1)
    pos_x = pos_x.reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], -1)
    pos_y = pos_y.reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


class SinePositionalEncoding:
    """Thin object wrapper mirroring the mmcv module API (parameter-free)."""

    def __init__(self, num_feats=256, temperature=10000, normalize=False,
                 scale=2.0 * np.pi, eps=1e-6, offset=0.0):
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize
        self.scale = scale
        self.eps = eps
        self.offset = offset

    def __call__(self, h: int, w: int) -> np.ndarray:
        return sine_positional_encoding(
            h, w, self.num_feats, self.temperature, self.normalize,
            self.scale, self.eps, self.offset,
        )
