from . import common, depth_transform  # noqa: F401  (registers transforms)
from .diffusion_model import Diffusion_DCbase_Model, build_model, get_model

__all__ = ["Diffusion_DCbase_Model", "build_model", "get_model"]
