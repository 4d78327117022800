from . import windows, framing, spectral, interp, filters, melcep

__all__ = ["windows", "framing", "spectral", "interp", "filters", "melcep"]
