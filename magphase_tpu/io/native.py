"""ctypes bindings for the C++ corpus-IO runtime (native/magphase_io.cpp).

Falls back to the pure-Python codecs transparently when the shared library
is missing; ``build()`` compiles it with g++ (no pybind11 in this
environment — plain C ABI + ctypes).
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SO_PATH = os.path.join(_REPO_ROOT, "native", "libmagphase_io.so")
_lib = None


def build(force: bool = False) -> bool:
    """Compile the native library.  Returns True on success."""
    src_dir = os.path.join(_REPO_ROOT, "native")
    if os.path.exists(_SO_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", src_dir], check=True,
                       capture_output=True)
        return True
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO_PATH):
        if not build():
            return None
    lib = ctypes.CDLL(_SO_PATH)
    lib.mp_read_wav.restype = ctypes.c_int64
    lib.mp_read_wav.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                ctypes.c_int64, ctypes.c_void_p]
    lib.mp_write_wav.restype = ctypes.c_int32
    lib.mp_write_wav.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_int32]
    lib.mp_read_binfile.restype = ctypes.c_int64
    lib.mp_read_binfile.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                    ctypes.c_int64]
    lib.mp_write_binfile.restype = ctypes.c_int32
    lib.mp_write_binfile.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                                     ctypes.c_int64]
    lib.mp_batch_read_wavs.restype = ctypes.c_int32
    lib.mp_batch_read_wavs.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str):
    """Native WAV read -> (float32 signal, fs); falls back to Python.

    The buffer is sized exactly from the RIFF header (a ~100-byte read),
    so arbitrarily long files decode without an artificial cap."""
    lib = _load()
    if lib is None:
        from .wav import read_wav as py_read
        sig, fs = py_read(path)
        return np.asarray(sig, np.float32), fs
    from .wav import read_wav_info
    total, _ = read_wav_info(path)
    out = np.empty(total, np.float32)
    fs = ctypes.c_int32(0)
    n = lib.mp_read_wav(path.encode(), out.ctypes.data, total,
                        ctypes.byref(fs))
    if n < 0:
        raise IOError(f"native wav read failed: {path}")
    return out[:n], int(fs.value)


def batch_read_wavs(paths: list[str], max_len: int,
                    n_threads: int | None = None):
    """Threaded padded batch load -> ((B, max_len) float32, lens, fss)."""
    lib = _load()
    B = len(paths)
    if lib is None:
        from .wav import read_wav as py_read
        out = np.zeros((B, max_len), np.float32)
        lens, fss = [], []
        for i, p in enumerate(paths):
            sig, fs = py_read(p)
            n = min(len(sig), max_len)
            out[i, :n] = sig[:n]
            lens.append(n)
            fss.append(fs)
        return out, np.asarray(lens), np.asarray(fss)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    blob = b"".join(p.encode() + b"\0" for p in paths)
    out = np.zeros((B, max_len), np.float32)
    lens = np.zeros(B, np.int64)
    fss = np.zeros(B, np.int32)
    rc = lib.mp_batch_read_wavs(blob, B, out.ctypes.data, max_len,
                                lens.ctypes.data, fss.ctypes.data,
                                n_threads)
    if rc != 0:
        raise IOError("native batch wav read failed")
    return out, lens, fss


def read_binfile(path: str, dim: int = 60):
    lib = _load()
    if lib is None:
        from .featfile import read_binfile as py_read
        return py_read(path, dim)
    size = os.path.getsize(path) // 4
    out = np.empty(size, np.float32)
    n = lib.mp_read_binfile(path.encode(), out.ctypes.data, size)
    if n != size:
        raise IOError(f"native binfile read failed: {path}")
    if size % dim != 0:
        raise ValueError(f"{path}: size {size} not divisible by dim {dim}")
    return np.squeeze(out.reshape(-1, dim).astype(np.float64))


def write_wav(path: str, sig: np.ndarray, fs: int) -> None:
    lib = _load()
    if lib is None:
        from .wav import write_wav as py_write
        py_write(path, sig, fs)
        return
    sig32 = np.ascontiguousarray(sig, np.float32)
    if lib.mp_write_wav(path.encode(), sig32.ctypes.data, len(sig32),
                        fs) != 0:
        raise IOError(f"native wav write failed: {path}")
