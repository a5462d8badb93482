"""Batched on-device F0 extraction (normalized-autocorrelation method).

Replaces the reference's pyworld DIO+StoneMask CPU path
(`models/prompt_tts_modified/feats.py:121-156`). pyworld runs one utterance at
a time on the host; here pitch is a jittable, vmappable jnp op so the whole
training batch's F0 is extracted on the TPU as part of the input pipeline.

Algorithm: per frame, normalized autocorrelation over the lag window
[sr/pitch_max, sr/pitch_min], best-peak pick with parabolic refinement, a
voicing decision by NAC threshold, then the same continuous-pitch completion
as the reference (`feats.py:99-120`): edge-fill + linear interpolation over
unvoiced gaps — implemented vectorized with prev/next-voiced index scans
instead of scipy interp1d.

Output is frame-rate F0 in Hz (0 never emitted after interpolation unless the
whole signal is unvoiced), aligned with the center=True mel frames
(n_frames = 1 + T//hop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from emotivoice_tpu.ops.stft import frame_signal, hann_window


def _interp_unvoiced(pitch: jnp.ndarray, voiced: jnp.ndarray) -> jnp.ndarray:
    """Vectorized equivalent of reference `_convert_to_continuous_pitch`."""
    t = pitch.shape[-1]
    idx = jnp.arange(t)

    prev_pos = jax.lax.associative_scan(jnp.maximum, jnp.where(voiced, idx, -1))
    next_pos_r = jax.lax.associative_scan(
        jnp.maximum, jnp.where(voiced[::-1], idx, -1)
    )
    next_pos = (t - 1) - next_pos_r[::-1]

    prev_val = pitch[jnp.clip(prev_pos, 0, t - 1)]
    next_val = pitch[jnp.clip(next_pos, 0, t - 1)]

    has_prev = prev_pos >= 0
    has_next = next_pos <= t - 1

    span = jnp.maximum(next_pos - prev_pos, 1).astype(pitch.dtype)
    frac = (idx - prev_pos).astype(pitch.dtype) / span
    interp = prev_val + (next_val - prev_val) * frac

    out = jnp.where(has_prev & has_next, interp, 0.0)
    out = jnp.where(has_prev & ~has_next, prev_val, out)
    out = jnp.where(~has_prev & has_next, next_val, out)
    any_voiced = jnp.any(voiced)
    return jnp.where(any_voiced, out, jnp.zeros_like(pitch))


@functools.partial(
    jax.jit,
    static_argnames=(
        "sr", "hop_length", "frame_length", "pitch_min", "pitch_max",
        "return_voiced",
    ),
)
def extract_pitch(
    wav: jnp.ndarray,
    sr: int = 16000,
    hop_length: int = 256,
    frame_length: int = 1024,
    pitch_min: float = 80.0,
    pitch_max: float = 400.0,
    nac_threshold: float = 0.3,
    return_voiced: bool = False,
) -> jnp.ndarray:
    """(B, T) or (T,) waveform -> (B, 1 + T//hop) F0 in Hz.

    With ``return_voiced=True`` additionally returns the per-frame voicing
    decision (before unvoiced-gap interpolation) for validation/metrics."""
    squeeze = wav.ndim == 1
    if squeeze:
        wav = wav[None]
    pad = frame_length // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    frames = frame_signal(x, frame_length, hop_length)  # (B, F, L)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)

    # Autocorrelation via FFT (Wiener-Khinchin), windowed.
    win = jnp.asarray(hann_window(frame_length))
    fw = frames * win[None, None, :]
    n_fft2 = 2 * frame_length
    spec = jnp.fft.rfft(fw, n=n_fft2, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), n=n_fft2, axis=-1)[
        ..., :frame_length
    ]

    lag_min = max(int(sr / pitch_max), 2)
    lag_max = min(int(np.ceil(sr / pitch_min)), frame_length - 2)
    lags = jnp.arange(lag_min, lag_max + 1)

    e0 = acf[..., 0:1]
    nac = acf[..., lag_min : lag_max + 1] / jnp.maximum(e0, 1e-10)

    # Octave-robust peak pick (the classic NAC failure is choosing a longer
    # lag — a subharmonic/octave-down — whose peak is marginally higher):
    # among lags whose peak is within `octave_margin` of the global max, take
    # the SHORTEST lag, like Praat's octave-cost tie-break.
    octave_margin = 0.85
    gmax = jnp.max(nac, axis=-1, keepdims=True)
    good = nac >= octave_margin * jnp.maximum(gmax, 1e-10)
    first_good = jnp.argmax(good, axis=-1)
    # A candidate counts only if it is itself a local peak; otherwise fall
    # back to the global argmax.
    inner = nac[..., 1:-1]
    is_peak = (inner >= nac[..., :-2]) & (inner >= nac[..., 2:])
    is_peak = jnp.pad(is_peak, [(0, 0)] * (nac.ndim - 1) + [(1, 1)])
    fg_peak = jnp.take_along_axis(
        is_peak, first_good[..., None], axis=-1
    )[..., 0]
    best = jnp.where(fg_peak, first_good, jnp.argmax(nac, axis=-1))
    peak = jnp.take_along_axis(nac, best[..., None], axis=-1)[..., 0]

    # Parabolic interpolation around the best integer lag.
    bm = jnp.clip(best, 1, nac.shape[-1] - 2)
    ym1 = jnp.take_along_axis(nac, (bm - 1)[..., None], -1)[..., 0]
    y0 = jnp.take_along_axis(nac, bm[..., None], -1)[..., 0]
    yp1 = jnp.take_along_axis(nac, (bm + 1)[..., None], -1)[..., 0]
    denom = ym1 - 2 * y0 + yp1
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (ym1 - yp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag = lags[best].astype(jnp.float32) + jnp.where(best == bm, delta, 0.0)

    f0 = sr / jnp.maximum(lag, 1.0)
    voiced = (peak > nac_threshold) & (e0[..., 0] > 1e-8)
    f0 = jnp.where(voiced, f0, 0.0)

    f0 = jax.vmap(_interp_unvoiced)(f0, voiced)
    if squeeze:
        f0, voiced = f0[0], voiced[0]
    if return_voiced:
        return f0, voiced
    return f0


def normalize_pitch(f0: jnp.ndarray, stats=(225.089, 53.78)) -> jnp.ndarray:
    """Corpus z-score (reference `prompt_dataset.py` pitch normalization,
    stats from `config/joint/config.py:108`)."""
    mean, std = stats
    return (f0 - mean) / std


def continuous_pitch_np(pitch: np.ndarray) -> np.ndarray:
    """Host-side unvoiced-gap completion matching reference
    `_convert_to_continuous_pitch` (feats.py:92-112): edge frames take the
    first/last voiced value, interior gaps interpolate linearly."""
    pitch = np.asarray(pitch, np.float64).copy()
    nz = np.flatnonzero(pitch != 0)
    if nz.size == 0:
        return pitch
    pitch[: nz[0]] = pitch[nz[0]]
    pitch[nz[-1]:] = pitch[nz[-1]]
    nz = np.flatnonzero(pitch != 0)
    return np.interp(np.arange(pitch.shape[0]), nz, pitch[nz])


def extract_pitch_pyworld(
    wav: np.ndarray, sr: int = 16000, hop_length: int = 256
) -> np.ndarray:
    """Exact-reference host pitch path: pyworld DIO + StoneMask at
    frame_period = 1000*hop/sr with pyworld's default F0 range, then
    continuous-pitch completion (reference feats.py:115-130 — note the
    reference passes no f0_floor/f0_ceil to dio despite holding
    pitch_min/max). Optional: requires pyworld; the jittable
    ``extract_pitch`` above is the default training path, this one exists
    for users who want bit-level reference targets and for the
    cross-validation tests (tests/test_pitch_pyworld.py)."""
    import pyworld  # noqa: F401  (optional dependency)

    x = np.asarray(wav, np.float64)
    frame_period = 1000.0 * hop_length / sr
    f0, t = pyworld.dio(x, fs=sr, frame_period=frame_period)
    f0 = pyworld.stonemask(x, f0, t, sr)
    return continuous_pitch_np(f0)
