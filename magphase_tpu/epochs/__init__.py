from .tracker import extract_epochs, track_f0, place_epochs


def get_pitch_marks(v_sig, fs: int):
    """libaudio.py:469-491 parity (REAPER via temp files in the reference):
    returns pitch-mark times in seconds from the on-device tracker.

    Note the reference's legacy helper returns only the mark times; use
    ``extract_epochs`` to also get voicing flags.
    """
    return extract_epochs(v_sig, fs)[0]


__all__ = ["extract_epochs", "track_f0", "place_epochs",
           "get_pitch_marks"]
