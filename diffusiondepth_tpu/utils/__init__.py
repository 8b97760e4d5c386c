"""Utilities: checkpointing, torch-checkpoint conversion, source backup,
profiling hooks (reference: src/utility.py)."""

from .checkpoint import load_checkpoint, save_checkpoint
from .misc import backup_source_code

__all__ = ["save_checkpoint", "load_checkpoint", "backup_source_code"]
