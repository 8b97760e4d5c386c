"""Summary / logging plugins.

Mirrors the reference plugin surface (src/summary/__init__.py:26-31: resolve
``args.model_name + 'Summary'``) with the same on-disk artifacts:

  * plain-text epoch logs  ``loss_{mode}.txt`` / ``metric_{mode}.txt`` with
    the reference's exact line format ``'{:04d} | Loss    |  L1: 0.1234 ...'``
    (src/summary/diffusion_dcbase_summary.py:53-76) so logs diff cleanly
  * scalar history as ``scalars_{mode}.jsonl`` (replaces TensorBoard event
    files - greppable, no heavyweight writer on the host thread)
  * composite colormapped image panels per epoch (rgb | sparse | pred | gt)
  * per-sample dumps: 16-bit KITTI-submission PNGs (uint16(pred*256)),
    optional raw ``.npy``  (reference :166-318)

All tensors are NHWC numpy by the time they reach a writer; device work is
never blocked on summary IO.
"""

from __future__ import annotations

from .diffusion_dcbase_summary import Diffusion_DCbase_Summary
from .nlspn_summary import NLSPNSummary


def get(args):
    """Resolve summary class by naming convention (reference
    src/summary/__init__.py:26-31)."""
    name = args.model_name + "Summary"
    table = {
        "Diffusion_DCbase_Summary": Diffusion_DCbase_Summary,
        "Diffusion_DCx4base_Summary": Diffusion_DCbase_Summary,
        "NLSPNSummary": NLSPNSummary,
    }
    if name not in table:
        raise NotImplementedError(name)
    return table[name]


__all__ = ["get", "Diffusion_DCbase_Summary", "NLSPNSummary"]
