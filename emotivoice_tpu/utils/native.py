"""ctypes bindings for the native C++ audio runtime (native/audio_io.cc).

Loads `native/build/libemotivoice_audio.so`, compiling it on first use when
g++ is available (`make -C native`). All call sites fall back to the
pure-Python implementations in `audio_io.py` when the library is absent, so
the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libemotivoice_audio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, or None if unavailable. Thread-safe, cached."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.isdir(_NATIVE_DIR):
            _build()
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ev_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_long),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.ev_wav_info.restype = ctypes.c_int
        lib.ev_wav_read.argtypes = [ctypes.c_char_p, _f32p, ctypes.c_long]
        lib.ev_wav_read.restype = ctypes.c_int
        lib.ev_wav_write.argtypes = [
            ctypes.c_char_p, _f32p, ctypes.c_long, ctypes.c_int
        ]
        lib.ev_wav_write.restype = ctypes.c_int
        lib.ev_trim_silence.argtypes = [
            _f32p, ctypes.c_long, ctypes.c_int, ctypes.c_float,
            ctypes.c_float,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        lib.ev_trim_silence.restype = None
        lib.ev_resample_len.argtypes = [
            ctypes.c_long, ctypes.c_int, ctypes.c_int
        ]
        lib.ev_resample_len.restype = ctypes.c_long
        lib.ev_resample.argtypes = [
            _f32p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
            _f32p, ctypes.c_long,
        ]
        lib.ev_resample.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def read_wav(path: str):
    """Native wav decode + mono mix. Returns (sr, float32 wav) or None."""
    lib = load()
    if lib is None:
        return None
    sr = ctypes.c_int()
    n = ctypes.c_long()
    ch = ctypes.c_int()
    if lib.ev_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(n),
                       ctypes.byref(ch)):
        return None
    out = np.empty(n.value, np.float32)
    if lib.ev_wav_read(path.encode(), out, n.value):
        return None
    return sr.value, out


def write_wav(path: str, wav: np.ndarray, sr: int) -> bool:
    lib = load()
    if lib is None:
        return False
    wav = np.ascontiguousarray(np.asarray(wav, np.float32).reshape(-1))
    return lib.ev_wav_write(path.encode(), wav, len(wav), sr) == 0


def trim_silence(wav: np.ndarray, sr: int, threshold: float = 0.005,
                 pad_ms: float = 50.0):
    """Returns the trimmed view, or None when the library is absent."""
    lib = load()
    if lib is None:
        return None
    wav = np.ascontiguousarray(np.asarray(wav, np.float32))
    start = ctypes.c_long()
    end = ctypes.c_long()
    lib.ev_trim_silence(wav, len(wav), sr, threshold, pad_ms,
                        ctypes.byref(start), ctypes.byref(end))
    return wav[start.value:end.value]


def resample(wav: np.ndarray, sr_in: int, sr_out: int):
    """Windowed-sinc resample, or None when the library is absent."""
    lib = load()
    if lib is None:
        return None
    wav = np.ascontiguousarray(np.asarray(wav, np.float32))
    n_out = lib.ev_resample_len(len(wav), sr_in, sr_out)
    out = np.empty(n_out, np.float32)
    if lib.ev_resample(wav, len(wav), sr_in, sr_out, out, n_out):
        return None
    return out
