"""JAX epoch (pitch-mark) tracker — REAPER replacement.

Placeholder module; the full NCCF + Viterbi + GCI-refinement tracker lands in
`extract_epochs`.  See epochs/tracker.py design notes.
"""
from __future__ import annotations

import numpy as np


def extract_epochs(v_sig: np.ndarray, fs: int):
    raise NotImplementedError(
        "JAX epoch tracker not built yet; pass est_file/pm_sec explicitly.")
