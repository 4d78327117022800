"""magphase_tpu — a TPU-native MagPhase-class vocoder framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
CSTR-Edinburgh/magphase (see SURVEY.md): pitch-synchronous spectral
analysis (mag/real/imag/lf0 streams), mel-warped compression, post-filters,
and FFT+PSOLA resynthesis — with the reference's external native tools
(REAPER, SPTK) re-implemented as on-device JAX kernels.
"""
import os as _os


def _enable_persistent_compile_cache() -> None:
    """Persist XLA compilations across processes (first tracker/vocoder
    compiles take minutes on TPU; CLI invocations would pay them every
    run).  Users override via JAX_COMPILATION_CACHE_DIR or by setting the
    jax config themselves; MAGPHASE_NO_COMPILE_CACHE=1 disables."""
    if _os.environ.get("MAGPHASE_NO_COMPILE_CACHE"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax
        path = _os.path.join(_os.path.expanduser("~"), ".cache",
                             "magphase_tpu", "xla")
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:          # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from .config import (MagPhaseConfig, define_alpha, define_fft_len,
                     define_crossfade_params, DEFAULT_48K, DEFAULT_16K)
from .vocoder import (analysis_lossless, analysis_with_del_comp_from_pm,
                      synthesis_from_lossless, f0_to_shift, shift_to_pm,
                      pm_to_shift)

__version__ = "0.1.0"
