"""Static-shape bucketing helpers.

Under jit every distinct array shape triggers a recompile, so host wrappers
pad signals / frame counts up to a small set of bucket sizes.
"""
from __future__ import annotations

import numpy as np


def bucket(n: int, step: int) -> int:
    """Smallest multiple of ``step`` >= n (>= step)."""
    return max(step, int(np.ceil(n / step)) * step)


SIG_STEP = 1 << 15       # 32768 samples (~0.68 s @ 48 kHz)
FRM_STEP = 128           # frames


def pad_to(arr: np.ndarray, n: int, axis: int = 0, value=0) -> np.ndarray:
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=value)
