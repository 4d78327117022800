"""Tracker evaluation against INDEPENDENT ground truth (round-2 VERDICT
item 2): stimuli with exactly known epochs, scored with standard metrics —
gross pitch error, voicing false alarm/miss, GCI identification/jitter.

Two stimulus families, neither of which the DP costs were tuned on:
 * pulse-train-excited formant synthesis (exact impulse GCIs, controlled
   f0 contours spanning the 50-400 Hz tracking range);
 * the vocoder's own synthesis from the checked-in Merlin-PREDICTED
   parameters (hvd_704/705 — utterances outside the tuning corpus), whose
   PSOLA pitch marks are the ground truth by construction.
"""
import os

import numpy as np
import pytest

from magphase_tpu.epochs import extract_epochs
from magphase_tpu.utils.tracker_eval import (degrade_stimulus,
                                             make_stimulus, tracker_metrics)

PRED_DIR = "/root/reference/demos/data_48k/params_predicted"
FS = 48000

# measured on these exact stimuli (CPU, 2026-08, r5 two-phase snap
# window — tracker.py SNAP_*): gpe = 0, voi_miss = 0, voi_fa <= 0.0149,
# gci_hit >= 0.9688, jitter <= 0.1 ms — clean gates sit just above
# (r4: gpe <= 0.0122, hit >= 0.8902; r3 VERDICT item 5: tightened from
# gpe 3% / hit 85%)
SYNTH_CASES = {
    "steady120": [(0.3, 120, 120)],
    "rise90_180": [(0.4, 90, 180)],
    "fall300_150": [(0.4, 300, 150)],
    "high350": [(0.3, 350, 350)],
    "low60": [(0.4, 60, 60)],
    "low_male_55_85": [(0.5, 55, 85)],
    "mixed": [(0.2, None, None), (0.3, 140, 200), (0.15, None, None),
              (0.3, 220, 110), (0.1, None, None)],
}

# robustness envelope beyond clean read speech (r3 VERDICT item 5;
# r5/VERDICT r4 item 5 closed the reverb gap with the two-phase snap
# window).  Measured worst-per-degradation across all SYNTH_CASES (CPU,
# seed 7; r4 values for contrast in docs/ROUND4.md — reverb GPE was
# 8.5% before the narrow in-run window):
#   snr20 / snr10 — gpe 0, fa 0, hit 96.9%
#   reverb 0.2 s  — gpe 0, fa 3.1%, hit 93.9%
#   snr20+rvb.15  — gpe 0, fa 3.1%, hit 93.9%
#   snr10+rvb.20  — gpe 0, fa 0, hit 93.9%
DEGRADATIONS = {
    "snr20": (dict(snr_db=20),
              dict(gpe=0.01, voi_miss=0.02, voi_fa=0.03, gci_hit=0.93)),
    "snr10": (dict(snr_db=10),
              dict(gpe=0.01, voi_miss=0.02, voi_fa=0.03, gci_hit=0.93)),
    "reverb200ms": (dict(rt60_s=0.2),
                    dict(gpe=0.02, voi_miss=0.02, voi_fa=0.05,
                         gci_hit=0.90)),
    "snr20_reverb": (dict(snr_db=20, rt60_s=0.15),
                     dict(gpe=0.02, voi_miss=0.02, voi_fa=0.05,
                          gci_hit=0.90)),
    "snr10_reverb": (dict(snr_db=10, rt60_s=0.2),
                     dict(gpe=0.03, voi_miss=0.02, voi_fa=0.05,
                          gci_hit=0.90)),
}


@pytest.mark.parametrize("name", sorted(SYNTH_CASES))
def test_tracker_on_known_epoch_stimuli(name):
    sig, gci, ivals, f0_at = make_stimulus(FS, SYNTH_CASES[name], seed=1)
    pm, voi = extract_epochs(sig, FS)
    m = tracker_metrics(pm, voi, gci, ivals, f0_at, len(sig) / FS)
    assert m["gpe"] < 0.01, m
    assert m["voi_miss"] < 0.02, m
    assert m["voi_fa"] < 0.03, m
    assert m["gci_hit"] > 0.93, m
    assert m["gci_jitter"] < 1.0e-3, m


@pytest.mark.parametrize("deg", sorted(DEGRADATIONS))
@pytest.mark.parametrize("name", sorted(SYNTH_CASES))
def test_tracker_robustness_under_degradation(name, deg):
    """Additive noise (SNR 20/10 dB), mild reverb (RT60 0.2 s) and their
    combination: the tracker must stay inside REAPER's practical
    operating envelope, not just clean read speech."""
    dkw, gates = DEGRADATIONS[deg]
    sig, gci, ivals, f0_at = make_stimulus(FS, SYNTH_CASES[name], seed=1)
    sig = degrade_stimulus(sig, FS, seed=7, **dkw)
    pm, voi = extract_epochs(sig, FS)
    m = tracker_metrics(pm, voi, gci, ivals, f0_at, len(sig) / FS)
    assert m["gpe"] < gates["gpe"], (deg, m)
    assert m["voi_miss"] < gates["voi_miss"], (deg, m)
    assert m["voi_fa"] < gates["voi_fa"], (deg, m)
    assert m["gci_hit"] > gates["gci_hit"], (deg, m)


@pytest.mark.skipif(not os.path.isdir(PRED_DIR), reason="no demo data")
@pytest.mark.parametrize("tok", ["hvd_704", "hvd_705"])
def test_tracker_on_vocoded_speech_with_known_marks(tok):
    """Speech-realistic ground truth: synthesis_from_compressed places its
    OLA frames at pitch marks derived exactly from lf0 — those marks and
    the lf0 voicing are the truth the tracker must recover.
    Measured (CPU): gpe <= 0.028, voi_miss <= 0.0654, voi_fa = 0,
    gci_hit >= 0.9652, jitter <= 0.6 ms."""
    import jax
    from magphase_tpu.io import read_binfile
    from magphase_tpu.vocoder import synthesis_from_compressed
    from magphase_tpu.vocoder.framerate import f0_to_shift_np

    mag = read_binfile(os.path.join(PRED_DIR, tok + ".mag"), 60)
    real = read_binfile(os.path.join(PRED_DIR, tok + ".real"), 45)
    imag = read_binfile(os.path.join(PRED_DIR, tok + ".imag"), 45)
    lf0 = np.asarray(read_binfile(os.path.join(PRED_DIR, tok + ".lf0"), 1),
                     np.float64).squeeze()
    v_f0 = np.exp(lf0)
    voi_t = v_f0 > 1.0
    pm_true = np.cumsum(f0_to_shift_np(v_f0, FS).astype(int)) / FS

    syn = np.asarray(synthesis_from_compressed(
        mag, real, imag, lf0, FS, b_out_hpf=False,
        key=jax.random.PRNGKey(0)))

    ivals, s = [], None
    for i, v in enumerate(voi_t):
        if v and s is None:
            s = pm_true[i]
        if (not v or i == len(voi_t) - 1) and s is not None:
            ivals.append((s, pm_true[i]))
            s = None

    def f0_at(t):
        return np.interp(np.asarray(t, np.float64), pm_true[voi_t],
                         v_f0[voi_t])

    pm, voi = extract_epochs(syn, FS)
    m = tracker_metrics(pm, voi, pm_true[voi_t], ivals, f0_at,
                        len(syn) / FS)
    assert m["gpe"] < 0.05, m
    assert m["voi_miss"] < 0.10, m
    assert m["voi_fa"] < 0.02, m
    assert m["gci_hit"] > 0.93, m
    assert m["gci_jitter"] < 1.5e-3, m
