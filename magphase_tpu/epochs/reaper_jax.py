"""JAX epoch (pitch-mark) tracker — REAPER replacement (see tracker.py)."""
from __future__ import annotations

from .tracker import extract_epochs, track_f0, place_epochs

__all__ = ["extract_epochs", "track_f0", "place_epochs"]
