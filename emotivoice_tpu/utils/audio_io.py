"""Waveform I/O via scipy (librosa/soundfile-free).

Covers the reference's `scipy.io.wavfile.read` dataset loading
(`prompt_dataset.py:33-37`) and int16 output writing
(`inference_am_vocoder_joint.py:130-134`).
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile

MAX_WAV_VALUE = 32768.0


def read_wav(path: str) -> tuple[int, np.ndarray]:
    """Returns (sample_rate, float32 waveform in [-1, 1])."""
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
    wav = np.asarray(wav)
    out = np.clip(wav * MAX_WAV_VALUE, -32768, 32767).astype(np.int16)
    wavfile.write(path, sr, out)


def trim_silence(
    wav: np.ndarray, sr: int, threshold: float = 0.005, pad_ms: float = 50.0
) -> np.ndarray:
    """Amplitude trim at `threshold` x peak with `pad_ms` padding kept —
    reference `prompt_dataset.py:39-46` (0.5% of peak, 50 ms)."""
    peak = np.abs(wav).max()
    if peak <= 0:
        return wav
    above = np.where(np.abs(wav) > threshold * peak)[0]
    if len(above) == 0:
        return wav
    pad = int(sr * pad_ms / 1000.0)
    start = max(int(above[0]) - pad, 0)
    end = min(int(above[-1]) + pad, len(wav))
    return wav[start:end]
