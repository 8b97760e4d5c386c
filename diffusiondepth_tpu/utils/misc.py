"""Misc run utilities (reference: src/utility.py:133-143)."""

from __future__ import annotations

import os
import shutil


def backup_source_code(backup_dir: str):
    """Snapshot the package source into the run dir (reference
    backup_source_code, src/utility.py:133-143)."""
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if os.path.exists(backup_dir):
        shutil.rmtree(backup_dir)
    shutil.copytree(
        pkg_root,
        backup_dir,
        ignore=shutil.ignore_patterns("__pycache__", "*.pyc", ".git*"),
    )
