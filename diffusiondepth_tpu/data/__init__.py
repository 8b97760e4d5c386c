"""Data layer.

Mirrors the reference factory convention (src/data/__init__.py:19-24):
``get(args)`` resolves the dataset class by ``args.data_name``. Datasets are
plain-python samplers emitting NHWC numpy dicts
{rgb, dep, gt, K, depth_mask, depth_map}; the loader (loader.py) adds
shuffling, per-host sharding (the DistributedSampler equivalent),
multi-threaded decode, and batching.
"""

from .loader import DataLoader
from .synthetic import Synthetic


def get(args):
    name = args.data_name
    if name == "NYU":
        from .nyu import NYU

        return NYU
    if name == "KITTIDC":
        from .kittidc import KITTIDC

        return KITTIDC
    if name == "Synthetic":
        return Synthetic
    raise NotImplementedError(f"dataset {name!r}")


class BaseDataset:
    """Reference BaseDataset equivalent (src/data/__init__.py:27-43)."""

    def __init__(self, args, mode):
        self.args = args
        self.mode = mode

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx):
        raise NotImplementedError


__all__ = ["get", "BaseDataset", "DataLoader", "Synthetic"]
