"""Objective evaluation: mel-spectral distortion between waveforms.

The reference's only extrinsic quality metric is Merlin's CALMCD
(development/run_merlin_experiment.py:191), computed outside the repo.
Here mel-spectral distortion (MSD, the MCD formula applied to log-mel
spectra) is first-class and runs on device: constant-rate STFT -> mel
filter bank -> frame-wise log-spectral RMS in dB.
"""
from __future__ import annotations

import numpy as np

_DB = 10.0 / np.log(10.0) * np.sqrt(2.0)   # MCD constant


def log_mel_spectrogram(v_sig, fs: int, n_mel: int = 60,
                        win_ms: float = 25.0, hop_ms: float = 5.0,
                        fft_len: int = 2048, alpha: float | None = None):
    """Constant-rate log-mel spectrogram — HOST numpy.

    This is a metric, not a synthesis path: jit would specialise on every
    distinct utterance length (one slow remote compile each on the real
    chip), so the FFT + fixed filter-bank matmul run in numpy."""
    from ..config import define_alpha
    from ..core.fbank import _fbank_matrix_np
    if alpha is None:
        alpha = define_alpha(fs)
    sig = np.asarray(v_sig, np.float32)
    win_len = int(round(fs * win_ms / 1000.0))
    hop = int(round(fs * hop_ms / 1000.0))
    n_frames = max(1, 1 + (len(sig) - win_len) // hop)
    idx = np.minimum(np.arange(n_frames)[:, None] * hop +
                     np.arange(win_len)[None, :], max(len(sig) - 1, 0))
    frames = sig[idx] * np.hanning(win_len)[None, :]
    spec = np.abs(np.fft.rfft(frames, n=fft_len))
    B = _fbank_matrix_np(alpha, spec.shape[1], n_mel)
    m_mel = spec @ np.asarray(B, np.float64)
    return np.log(np.maximum(m_mel, 1e-10))


def align_by_xcorr(v_sig_a, v_sig_b, fs: int,
                   max_lag_ms: float = 50.0):
    """Trim the pair to its best cross-correlation alignment (host numpy).

    Vocoded output is time-shifted relative to the input (OLA start trim,
    magphase.py:58-60), which would dominate a frame-wise spectral metric;
    the lag search is bounded to +-max_lag_ms."""
    a = np.asarray(v_sig_a, np.float64)
    b = np.asarray(v_sig_b, np.float64)
    n = min(len(a), len(b))
    L = min(int(max_lag_ms * fs / 1000.0), max(0, n // 2 - 1))
    if L == 0:
        return a[:n], b[:n]
    nfft = 1 << int(np.ceil(np.log2(2 * n)))
    xc = np.fft.irfft(np.fft.rfft(a[:n], nfft) *
                      np.conj(np.fft.rfft(b[:n], nfft)), nfft)
    cand = np.concatenate([xc[:L + 1], xc[-L:]])
    k = int(np.argmax(cand))
    lag = k if k <= L else k - (2 * L + 1)   # b lags a by `lag` samples
    if lag >= 0:
        a, b = a[lag:], b
    else:
        a, b = a, b[-lag:]
    n = min(len(a), len(b))
    return a[:n], b[:n]


def mel_spectral_distortion_piecewise(v_sig_a, v_sig_b, fs: int,
                                      chunk_s: float = 0.5,
                                      max_lag_ms: float = 30.0,
                                      trim: float = 0.2,
                                      return_worst: bool = False,
                                      **kw) -> float:
    """Drift-robust MSD: align globally, then re-align each ``chunk_s``
    window by ENERGY-NORMALISED cross-correlation and return the trimmed
    mean over chunks (worst ``trim`` fraction dropped).

    Why each piece (stability A/B over 3 noise keys on the 48 kHz
    corpus, tools notes in docs/ROUND4.md):
    * piecewise alignment — the compressed pipeline's lf0 medfilt
      (magphase.py:2500) legitimately perturbs the synthesis shift
      track, so pitch marks DRIFT tens of samples mid-utterance; one
      global alignment scores the same audio several dB apart depending
      on where the drift lands (13 -> 19 dB swings at 16 kHz between
      outputs differing by <4e-4 in amplitude);
    * normalised correlation — the raw dot product locks onto the
      loudest content inside the window, occasionally misaligning a
      quiet chunk entirely (one key flipped an utterance 8.97 -> 12.58);
    * trimmed mean — bounds the influence of any residual pathological
      chunk.  Together: max per-utterance spread across keys 0.62 dB,
      vs 3.8 (plain piecewise) and 4.7 (global) — stable enough to gate
      with ~0.5 dB margins.

    Because trimming makes the PRIMARY score blind to defects confined
    to < ``trim`` of the audio, gates should pair it with the untrimmed
    worst chunk: ``return_worst=True`` returns (trimmed_mean,
    max_chunk) so a localised catastrophic artifact (one broken chunk at
    40 dB) cannot hide in the dropped tail."""
    a, b = align_by_xcorr(v_sig_a, v_sig_b, fs)
    n = min(len(a), len(b))
    cs = int(chunk_s * fs)
    pad = int(max_lag_ms * fs / 1000.0)
    vals = []
    for st in range(0, n - cs + 1, cs):
        ref = a[st:st + cs]
        lo, hi = max(0, st - pad), min(n, st + cs + pad)
        cand = b[lo:hi]
        # local lag: slide ref over the padded candidate window,
        # normalising by the candidate window's local energy (cumsum
        # sliding window: O(len) vs O(len*cs) for a convolution)
        c = np.correlate(cand, ref, "valid")
        csum = np.concatenate(([0.0], np.cumsum(cand * cand)))
        e = np.sqrt(np.maximum(csum[cs:] - csum[:-cs], 0.0))[:len(c)]
        off = int(np.argmax(c / (e + 1e-12)))
        vals.append(mel_spectral_distortion(ref, cand[off:off + cs], fs,
                                            align=False, **kw))
    if not vals:
        v = mel_spectral_distortion(a, b, fs, align=False, **kw)
        return (v, v) if return_worst else v
    vals = np.sort(np.asarray(vals))
    keep = max(1, int(np.ceil(len(vals) * (1.0 - trim))))
    mean = float(np.mean(vals[:keep]))
    if return_worst:
        return mean, float(vals[-1])
    return mean


def mel_spectral_distortion(v_sig_a, v_sig_b, fs: int, n_mel: int = 60,
                            align: bool = True, exclude_gain: bool = False,
                            floor_db: float | None = None,
                            **kw) -> float:
    """Mean frame-wise mel-spectral distortion in dB between two waveforms
    (lower is better; identical signals -> 0).  Signals are aligned by
    bounded cross-correlation first (align=False to compare as-is) and
    truncated to the common length.  exclude_gain subtracts the per-frame
    mean log difference (the MCD convention of dropping c0), making the
    metric invariant to overall level — e.g. the 0.98 peak normalisation
    of write_audio_file.  floor_db clamps both log-mel matrices at
    floor_db below the REFERENCE signal's peak bin: without it, digital
    silence in a natural recording (log floor) vs a vocoder's noise floor
    dominates the mean with content-free distortion."""
    if align:
        v_sig_a, v_sig_b = align_by_xcorr(v_sig_a, v_sig_b, fs)
    n = min(len(v_sig_a), len(v_sig_b))
    ma = log_mel_spectrogram(v_sig_a[:n], fs, n_mel=n_mel, **kw)
    mb = log_mel_spectrogram(v_sig_b[:n], fs, n_mel=n_mel, **kw)
    if floor_db is not None:
        # magnitude-domain log-mel: x dB below peak = x * ln(10)/20
        floor = ma.max() - floor_db * np.log(10.0) / 20.0
        ma = np.maximum(ma, floor)
        mb = np.maximum(mb, floor)
    d = ma - mb
    if exclude_gain:
        d = d - d.mean(axis=1, keepdims=True)
    return float(np.mean(_DB * np.sqrt(np.sum(d * d, axis=1))))


def log_spectral_distortion_feats(m_log_a, m_log_b) -> float:
    """MCD formula over two already-aligned log-feature matrices
    (e.g. two .mag mel streams) — the compare_mags-style feature diff."""
    n = min(len(m_log_a), len(m_log_b))
    d = np.asarray(m_log_a)[:n] - np.asarray(m_log_b)[:n]
    return float(np.mean(_DB * np.sqrt(np.sum(d * d, axis=1))))
