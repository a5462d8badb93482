"""Mel filterbank + log-mel extraction (pure numpy/JAX, librosa-free).

The filterbank reproduces librosa's `filters.mel(htk=False, norm='slaney')`
exactly (the reference builds its mel basis with that call —
`tacotron_stft.py:64-69`, `mel_process.py:88-95`), so mels computed here are
bit-comparable with the reference pipeline.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from emotivoice_tpu.ops.stft import stft_magnitude

_F_SP = 200.0 / 3.0  # Slaney linear region: 66.67 Hz per mel step
_MIN_LOG_HZ = 1000.0
_MIN_LOG_MEL = _MIN_LOG_HZ / _F_SP
_LOGSTEP = np.log(6.4) / 27.0


def hz_to_mel(f):
    f = np.asanyarray(f, dtype=np.float64)
    mel = f / _F_SP
    log_region = f >= _MIN_LOG_HZ
    mel = np.where(
        log_region,
        _MIN_LOG_MEL + np.log(np.maximum(f, _MIN_LOG_HZ) / _MIN_LOG_HZ) / _LOGSTEP,
        mel,
    )
    return mel


def mel_to_hz(m):
    m = np.asanyarray(m, dtype=np.float64)
    f = m * _F_SP
    log_region = m >= _MIN_LOG_MEL
    f = np.where(log_region, _MIN_LOG_HZ * np.exp(_LOGSTEP * (m - _MIN_LOG_MEL)), f)
    return f


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sr: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = 8000.0,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_fft//2+1)."""
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    mel_f = mel_to_hz(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style energy normalization.
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, 1e-5)) — reference `audio_processing.py` compression."""
    return jnp.log(jnp.clip(x, clip_val, None))


def mel_spectrogram(
    wav: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float | None = 8000.0,
    *,
    loss_mode: bool = False,
) -> jnp.ndarray:
    """(B, T) or (T,) waveform in [-1, 1] -> (B, n_mels, n_frames) log-mel.

    loss_mode=False: dataset ground-truth mel (reference
    `TacotronSTFT.mel_spectrogram`, `tacotron_stft.py:80-92`).
    loss_mode=True: training-loss mel over waveform segments (reference
    `mel_spectrogram_torch`, `mel_process.py:77-110`).
    """
    mag = stft_magnitude(
        wav, n_fft, hop_length, win_length, center=True, loss_mode=loss_mode
    )
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mk,...kt->...mt", basis, mag, preferred_element_type=jnp.float32)
    return dynamic_range_compression(mel)


def mel_to_linear(
    mel: jnp.ndarray,
    sr: int = 16000,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: float = 8000.0,
) -> jnp.ndarray:
    """Approximate inverse of the mel projection via the filterbank
    pseudo-inverse: log-mel (B, n_mels, T) -> linear magnitude
    (B, n_bins, T). Pairs with ops.stft.griffin_lim as a checkpoint-free
    fallback vocoder (the reference's equivalent, feats.py:241-257, is
    dead librosa code)."""
    basis = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)  # (n_mels, n_bins)
    pinv = jnp.asarray(np.linalg.pinv(np.asarray(basis)))  # (n_bins, n_mels)
    amp = jnp.exp(mel)  # undo dynamic_range_compression's log
    lin = jnp.einsum("km,bmt->bkt", pinv, amp, preferred_element_type=jnp.float32)
    return jnp.clip(lin, 0.0, None)
