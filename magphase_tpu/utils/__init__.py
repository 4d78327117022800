from .padding import bucket, pad_to, SIG_STEP, FRM_STEP
from .parallel_map import run_multithreaded

__all__ = ["bucket", "pad_to", "SIG_STEP", "FRM_STEP", "run_multithreaded"]
