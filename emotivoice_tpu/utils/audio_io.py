"""Waveform I/O: native C++ fast path with a scipy fallback.

Covers the reference's `scipy.io.wavfile.read` dataset loading
(`prompt_dataset.py:33-37`) and int16 output writing
(`inference_am_vocoder_joint.py:130-134`). When
`native/build/libemotivoice_audio.so` is present (`make -C native`),
decode/encode/trim run in C++ (emotivoice_tpu/utils/native.py); otherwise
the pure-Python implementations below are used.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile

from emotivoice_tpu.utils import native

MAX_WAV_VALUE = 32768.0


def read_wav(path: str) -> tuple[int, np.ndarray]:
    """Returns (sample_rate, float32 waveform in [-1, 1])."""
    if isinstance(path, str):
        got = native.read_wav(path)
        if got is not None:
            return got
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / MAX_WAV_VALUE
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim > 1:
        data = data.mean(axis=1)
    return sr, data


def write_wav(path: str, wav: np.ndarray, sr: int = 16000):
    """Write float waveform in [-1, 1] as int16 (reference scaling x32768)."""
    if isinstance(path, str) and native.write_wav(path, wav, sr):
        return
    wav = np.asarray(wav)
    out = np.clip(wav * MAX_WAV_VALUE, -32768, 32767).astype(np.int16)
    wavfile.write(path, sr, out)


def trim_silence(
    wav: np.ndarray, sr: int, threshold: float = 0.005, pad_ms: float = 50.0
) -> np.ndarray:
    """Amplitude trim at `threshold` x peak with `pad_ms` padding kept —
    reference `prompt_dataset.py:39-46` (0.5% of peak, 50 ms)."""
    trimmed = native.trim_silence(wav, sr, threshold, pad_ms)
    if trimmed is not None:
        return trimmed
    peak = np.abs(wav).max()
    return _trim_silence_py(wav, sr, threshold, pad_ms, peak)


def _trim_silence_py(wav, sr, threshold, pad_ms, peak):
    if peak <= 0:
        return wav
    above = np.where(np.abs(wav) > threshold * peak)[0]
    if len(above) == 0:
        return wav
    pad = int(sr * pad_ms / 1000.0)
    start = max(int(above[0]) - pad, 0)
    end = min(int(above[-1]) + pad, len(wav))
    return wav[start:end]


def resample(wav: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Resample via the native windowed-sinc kernel, falling back to scipy
    polyphase. Used by the corpus recipes (reference resamples with librosa,
    e.g. data/LJspeech/src/step1_clean_raw_data.py:44-48)."""
    if sr_in == sr_out:
        return np.asarray(wav, np.float32)
    out = native.resample(wav, sr_in, sr_out)
    if out is not None:
        return out
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_out, sr_in)
    return resample_poly(
        np.asarray(wav, np.float32), sr_out // g, sr_in // g
    ).astype(np.float32)


def wav_stream_header(sr: int = 16000, channels: int = 1, bits: int = 16) -> bytes:
    """RIFF/WAVE header with unknown (0xFFFFFFFF) data length, the streaming
    convention: players read PCM until the transport closes. Used by the
    HTTP streaming endpoint (serving/api.py)."""
    import struct

    byte_rate = sr * channels * bits // 8
    block_align = channels * bits // 8
    return b"".join([
        b"RIFF", struct.pack("<I", 0xFFFFFFFF), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 16, 1, channels, sr, byte_rate,
                             block_align, bits),
        b"data", struct.pack("<I", 0xFFFFFFFF),
    ])


def pcm16_bytes(wav: np.ndarray) -> bytes:
    """float waveform in [-1, 1] -> raw little-endian int16 PCM bytes."""
    wav = np.asarray(wav)
    return (
        np.clip(wav * MAX_WAV_VALUE, -32768, 32767)
        .astype("<i2")
        .tobytes()
    )
