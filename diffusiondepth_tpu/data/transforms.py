"""Host-side image transforms (PIL + numpy), torchvision-free.

Reproduces the exact augmentation semantics the reference gets from
torchvision (src/data/kittidc.py:128-233, src/data/nyu.py:102-156):
PIL-backend adjust_brightness/contrast/saturation are ImageEnhance ops,
Resize(int) resizes the shorter side, rotation is about the image center
without expansion, normalization uses the ImageNet statistics.
"""

from __future__ import annotations

import random
from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)

NEAREST = Image.NEAREST
BILINEAR = Image.BILINEAR
BICUBIC = Image.BICUBIC


def hflip(img: Image.Image) -> Image.Image:
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def rotate(img: Image.Image, angle: float, resample) -> Image.Image:
    # torchvision TF.rotate: counter-clockwise, no expand, center default
    return img.rotate(angle, resample=resample, expand=False)


def resize_shorter(img: Image.Image, size: int, resample) -> Image.Image:
    """torchvision T.Resize(int): shorter side -> size, keep aspect."""
    w, h = img.size
    if h <= w:
        new_h, new_w = size, max(1, round(size * w / h))
    else:
        new_w, new_h = size, max(1, round(size * h / w))
    return img.resize((new_w, new_h), resample)


def center_crop(img: Image.Image, crop_hw: Tuple[int, int]) -> Image.Image:
    ch, cw = crop_hw
    w, h = img.size
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return img.crop((left, top, left + cw, top + ch))


def crop(img: Image.Image, top: int, left: int, height: int, width: int) -> Image.Image:
    return img.crop((left, top, left + width, top + height))


def adjust_brightness(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Brightness(img).enhance(factor)


def adjust_contrast(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Contrast(img).enhance(factor)


def adjust_saturation(img: Image.Image, factor: float) -> Image.Image:
    return ImageEnhance.Color(img).enhance(factor)


def color_jitter(
    img: Image.Image,
    brightness: float,
    contrast: float,
    saturation: float,
    rng: random.Random,
) -> Image.Image:
    """torchvision T.ColorJitter: random factors, random op order."""
    ops = []
    if brightness > 0:
        f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
        ops.append(lambda im, f=f: adjust_brightness(im, f))
    if contrast > 0:
        f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
        ops.append(lambda im, f=f: adjust_contrast(im, f))
    if saturation > 0:
        f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
        ops.append(lambda im, f=f: adjust_saturation(im, f))
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


def rgb_to_normalized_array(img: Image.Image) -> np.ndarray:
    """uint8 PIL -> float32 (H, W, 3), /255, ImageNet-normalized."""
    arr = np.asarray(img, np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD


def depth_to_array(img: Image.Image) -> np.ndarray:
    """'F'-mode PIL depth -> float32 (H, W, 1)."""
    return np.asarray(img, np.float32)[..., None]


def sparse_sample(dep: np.ndarray, num_sample: int, rng: random.Random) -> np.ndarray:
    """Random sparse-depth subsampling (reference kittidc.py:316-334)."""
    flat = dep.reshape(-1)
    nnz = np.nonzero(flat > 0.0001)[0]
    if num_sample <= 0 or len(nnz) == 0:
        return np.zeros_like(dep)
    count = min(num_sample, len(nnz))
    chosen = np.asarray(rng.sample(range(len(nnz)), count))
    mask = np.zeros_like(flat)
    mask[nnz[chosen]] = 1.0
    return (flat * mask).reshape(dep.shape)
