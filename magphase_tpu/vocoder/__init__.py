from .lossless import (analysis_lossless, analysis_with_del_comp_from_pm,
                       synthesis_from_lossless, f0_to_shift, shift_to_pm,
                       pm_to_shift)

__all__ = [
    "analysis_lossless", "analysis_with_del_comp_from_pm",
    "synthesis_from_lossless", "f0_to_shift", "shift_to_pm", "pm_to_shift",
]
