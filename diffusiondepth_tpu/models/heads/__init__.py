from .denoiser import ScheduledCNNRefine
from .ddim_head import (
    DDIMDepthEstimate_MPVIT_ADDHAHI,
    DDIMDepthEstimate_Res,
    DDIMDepthEstimate_ResVis,
    DDIMDepthEstimate_Swin_ADD,
    DDIMDepthEstimate_Swin_ADDHAHI,
    DDIMDepthEstimate_Swin_ADDHAHIVis,
    DDIMDepthEstimateHead,
)

__all__ = [
    "ScheduledCNNRefine",
    "DDIMDepthEstimateHead",
    "DDIMDepthEstimate_Res",
    "DDIMDepthEstimate_ResVis",
    "DDIMDepthEstimate_Swin_ADD",
    "DDIMDepthEstimate_Swin_ADDHAHI",
    "DDIMDepthEstimate_Swin_ADDHAHIVis",
    "DDIMDepthEstimate_MPVIT_ADDHAHI",
]
