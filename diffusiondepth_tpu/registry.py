"""Minimal registry, replacing the mmcv/mmdet3d Registry machinery the reference
leans on (reference: src/model/ops/depth_transform.py:7, src/model/head/*.py
``@HEADS.register_module()``).

A registry is a plain dict from name -> callable. ``build`` accepts either a
name or an mmcv-style cfg dict ``{'type': Name, **kwargs}`` so head/transform
configuration stays drop-in compatible with the reference's cfg dicts
(reference: src/model/diffusion_dcbase_model.py:78-91).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._module_dict: Dict[str, Callable] = {}

    def register(self, obj: Optional[Callable] = None, *, name: Optional[str] = None):
        def _register(o):
            key = name or o.__name__
            if key in self._module_dict:
                raise KeyError(f"{key} already registered in {self.name}")
            self._module_dict[key] = o
            return o

        if obj is None:
            return _register
        return _register(obj)

    # mmcv-style alias
    def register_module(self, name: Optional[str] = None):
        return self.register(name=name)

    def get(self, key: str) -> Callable:
        if key not in self._module_dict:
            raise KeyError(
                f"{key!r} not found in registry {self.name!r}; "
                f"available: {sorted(self._module_dict)}"
            )
        return self._module_dict[key]

    def build(self, cfg: Any, **extra_kwargs):
        if isinstance(cfg, str):
            return self.get(cfg)(**extra_kwargs)
        if isinstance(cfg, dict):
            cfg = dict(cfg)
            obj_type = cfg.pop("type")
            cfg.update(extra_kwargs)
            return self.get(obj_type)(**cfg)
        raise TypeError(f"cfg must be str or dict, got {type(cfg)}")

    def __contains__(self, key: str) -> bool:
        return key in self._module_dict

    def keys(self):
        return self._module_dict.keys()


# Global registries mirroring the reference's plugin surface.
BACKBONES = Registry("backbones")
HEADS = Registry("heads")
DEPTH_TRANSFORMS = Registry("depth_transforms")
NECKS = Registry("necks")
MODELS = Registry("models")
DATASETS = Registry("datasets")
LOSSES = Registry("losses")
