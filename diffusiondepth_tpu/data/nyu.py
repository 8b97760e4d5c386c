"""NYUDepthV2 dataset (HDF5 per-sample files).

Re-implements the reference NYU dataset (src/data/nyu.py:56-195): fixed
resize shorter-side 240 -> center-crop 228x304, hardcoded half-resolution
intrinsics with crop offsets, train-time augmentation (hflip, +-5deg nearest
rotation, 1.0-1.5x scale with depth/scale compensation, color jitter
0.4/0.4/0.4 in random torchvision order), sparse-depth sampling via
``--num_sample``, and the scanline-completed ``depth_map`` channel.

Split json format: {"train": [{"filename": ...}], "val": [...], "test": [...]}.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict

import numpy as np

from . import transforms as T
from .depth_completion import simple_depth_completion

try:
    import h5py
except ImportError:  # pragma: no cover
    h5py = None

from PIL import Image

HEIGHT, WIDTH = 240, 320
CROP_SIZE = (228, 304)

# reference src/data/nyu.py:75-80
K_NYU = np.asarray(
    [
        5.1885790117450188e02 / 2.0,
        5.1946961112127485e02 / 2.0,
        3.2558244941119034e02 / 2.0 - 8.0,
        2.5373616633400465e02 / 2.0 - 6.0,
    ],
    np.float32,
)


class NYU:
    def __init__(self, args, mode):
        assert mode in ("train", "val", "test"), mode
        assert h5py is not None, "h5py required for the NYU dataset"
        self.args = args
        self.mode = mode
        self.augment = args.augment
        with open(args.split_json) as f:
            self.sample_list = json.load(f)[mode]

    def __len__(self):
        return len(self.sample_list)

    def __getitem__(self, idx, seed=None) -> Dict[str, np.ndarray]:
        rng = random.Random(seed)
        path = os.path.join(self.args.dir_data, self.sample_list[idx]["filename"])
        with h5py.File(path, "r") as f:
            rgb_arr = f["rgb"][:].transpose(1, 2, 0)
            dep_arr = f["depth"][:].astype(np.float32)

        rgb = Image.fromarray(rgb_arr, mode="RGB")
        dep = Image.fromarray(dep_arr, mode="F")

        if self.augment and self.mode == "train":
            _scale = rng.uniform(1.0, 1.5)
            scale = int(HEIGHT * _scale)
            degree = rng.uniform(-5.0, 5.0)
            flip = rng.uniform(0.0, 1.0)

            if flip > 0.5:
                rgb = T.hflip(rgb)
                dep = T.hflip(dep)

            rgb = T.rotate(rgb, degree, T.NEAREST)
            dep = T.rotate(dep, degree, T.NEAREST)

            rgb = T.resize_shorter(rgb, scale, T.BILINEAR)
            rgb = T.color_jitter(rgb, 0.4, 0.4, 0.4, rng)
            rgb = T.center_crop(rgb, CROP_SIZE)

            dep = T.resize_shorter(dep, scale, T.BILINEAR)
            dep = T.center_crop(dep, CROP_SIZE)

            rgb_np = T.rgb_to_normalized_array(rgb)
            dep_np = T.depth_to_array(dep) / _scale

            K = K_NYU.copy()
            K[0] *= _scale
            K[1] *= _scale
        else:
            rgb = T.center_crop(T.resize_shorter(rgb, HEIGHT, T.BILINEAR), CROP_SIZE)
            dep = T.center_crop(T.resize_shorter(dep, HEIGHT, T.BILINEAR), CROP_SIZE)
            rgb_np = T.rgb_to_normalized_array(rgb)
            dep_np = T.depth_to_array(dep)
            K = K_NYU.copy()

        dep_sp = T.sparse_sample(dep_np, self.args.num_sample, rng)

        depth_mask = (dep_sp > 0).astype(np.float32)
        if getattr(self.args, "ip_basic", False):
            # the reference's model-level ip_basic=True densification branch
            # (diffusion_dcbase_model.py:96-115) replaces the scanline-
            # completed depth_map, applied host-side
            from .ip_basic import densify_depth_map

            depth_map = densify_depth_map(dep_sp[..., 0], depth_mask[..., 0])
        else:
            depth_map, _ = simple_depth_completion(dep_sp[..., 0])

        return {
            "rgb": rgb_np,
            "dep": dep_sp,
            "gt": dep_np,
            "K": K,
            "depth_mask": depth_mask,
            "depth_map": depth_map[..., None],
        }
