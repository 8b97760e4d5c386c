"""Depth colormap visualisation (reference: src/model/ops/vis.py:6-31).

``color_depth``: log-scaled reversed-jet colouring - near is red, far is blue,
normalised over the fixed [1m, 115m] log range like the reference. Pure numpy
+ matplotlib (host-side; never on the device path).
"""

from __future__ import annotations

import numpy as np


def color_depth(depth: np.ndarray, vmin: float = 0, vmax: float = 200) -> np.ndarray:
    """(H, W) metric depth -> (H, W, 3) uint8 colour image."""
    import matplotlib as mpl
    import matplotlib.cm as cm

    depth_l = np.log(np.asarray(depth, np.float32) + 3.0)
    depth_near, depth_far = 1.0, 115.0
    normalizer = mpl.colors.Normalize(
        vmin=-np.log(depth_far), vmax=-np.log(depth_near)
    )
    mapper = cm.ScalarMappable(norm=normalizer, cmap="jet")
    return (mapper.to_rgba(-depth_l)[:, :, :3] * 255).astype(np.uint8)


def colormap_255(img_255: np.ndarray, cmap: str = "plasma") -> np.ndarray:
    """uint8 (H, W) -> (H, W, 3) float [0,1] via a named colormap, matching
    the summary panels' ``cm(x.astype('uint8'))`` usage
    (reference diffusion_dcbase_summary.py:131-135)."""
    import matplotlib.cm as cm

    mapper = cm.get_cmap(cmap)
    return mapper(img_255.astype(np.uint8))[:, :, :3]
