from .resize import (
    adaptive_avg_pool2d,
    adaptive_max_pool2d,
    resize_bilinear,
    resize_nearest,
    upsample2x_bilinear,
)

__all__ = [
    "resize_bilinear",
    "resize_nearest",
    "adaptive_avg_pool2d",
    "adaptive_max_pool2d",
    "upsample2x_bilinear",
]
