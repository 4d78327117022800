from .lossless import (analysis_lossless, analysis_with_del_comp_from_pm,
                       synthesis_from_lossless, f0_to_shift, shift_to_pm,
                       pm_to_shift)
from .compressed import (analysis_compressed, analysis_for_acoustic_modelling,
                         format_for_modelling, synthesis_from_compressed,
                         synthesis_from_acoustic_modelling,
                         phase_uncompress_type1_mcep,
                         get_num_full_mel_coeffs_from_num_phase_coeffs)
from .postfilter import post_filter, post_filter_merlin
from . import framerate

__all__ = [
    "analysis_lossless", "analysis_with_del_comp_from_pm",
    "synthesis_from_lossless", "f0_to_shift", "shift_to_pm", "pm_to_shift",
    "analysis_compressed", "analysis_for_acoustic_modelling",
    "format_for_modelling", "synthesis_from_compressed",
    "synthesis_from_acoustic_modelling", "phase_uncompress_type1_mcep",
    "get_num_full_mel_coeffs_from_num_phase_coeffs",
    "post_filter", "post_filter_merlin", "framerate",
]
