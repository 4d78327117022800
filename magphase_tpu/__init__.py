"""magphase_tpu — a TPU-native MagPhase-class vocoder framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
CSTR-Edinburgh/magphase (see SURVEY.md): pitch-synchronous spectral
analysis (mag/real/imag/lf0 streams), mel-warped compression, post-filters,
and FFT+PSOLA resynthesis — with the reference's external native tools
(REAPER, SPTK) re-implemented as on-device JAX kernels.
"""
from .config import (MagPhaseConfig, define_alpha, define_fft_len,
                     define_crossfade_params, DEFAULT_48K, DEFAULT_16K)
from .vocoder import (analysis_lossless, analysis_with_del_comp_from_pm,
                      synthesis_from_lossless, f0_to_shift, shift_to_pm,
                      pm_to_shift)

__version__ = "0.1.0"
