"""Backbone factory (reference: src/model/backbone/__init__.py:5-11 selects by
``args.backbone_module`` + ``args.backbone_name``)."""

from ...registry import BACKBONES
from . import mmbev_resnet  # noqa: F401  (registers resnet variants)


def get(args):
    """Return the backbone *constructor* registered under args.backbone_name.

    Mirrors the reference factory contract: the returned object is called with
    no arguments to build the module.
    """
    try:
        return BACKBONES.get(args.backbone_name)
    except KeyError:
        # lazily import heavier backbones only when requested
        if args.backbone_module == "swin":
            from . import swin  # noqa: F401
        elif args.backbone_module == "mpvit":
            from . import mpvit  # noqa: F401
        return BACKBONES.get(args.backbone_name)
