from .padding import bucket, pad_to, SIG_STEP, FRM_STEP

__all__ = ["bucket", "pad_to", "SIG_STEP", "FRM_STEP"]
