"""Speech-like golden validation of the on-device pitch extractor.

The reference extracts F0 with pyworld DIO+StoneMask on the host
(`/root/reference/models/prompt_tts_modified/feats.py:83-156`); pyworld is a
C library that is not installable in this environment, so instead of
replicating it we validate `ops/pitch.py` against *analytically known* F0 on
synthetic speech-like signals — glottal pulse trains with vibrato/glides,
formant resonances and additive noise. This is a stronger check than
pyworld parity for the property that matters to training: the z-scored
pitch targets (stats from reference config/joint/config.py:108) must not be
systematically shifted or octave-corrupted.

Acceptance gates (per signal): voicing agreement >= 90%, voiced-frame RMSE
within a few Hz, |mean bias| < 2 Hz, zero octave errors in interior frames.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from emotivoice_tpu.ops.pitch import extract_pitch

SR = 16000
HOP = 256


def _resonator(x: np.ndarray, fc: float, bw: float, sr: int = SR) -> np.ndarray:
    """Two-pole resonator (formant) filter."""
    r = np.exp(-np.pi * bw / sr)
    theta = 2 * np.pi * fc / sr
    b0 = (1 - r * r) * 1.0
    a = [1.0, -2 * r * np.cos(theta), r * r]
    from scipy.signal import lfilter

    return lfilter([b0], a, x)


def _glottal(f0_of_t, dur: float, seed: int = 0, noise_db: float = -35.0):
    """Pulse train with per-sample F0 -> formant-filtered speech-like signal.

    Returns (wav, per-frame true F0 at mel-frame centers).
    """
    n = int(SR * dur)
    t = np.arange(n) / SR
    f0 = np.asarray(f0_of_t(t), np.float64)
    phase = np.cumsum(f0) / SR
    pulses = (np.diff(np.floor(phase), prepend=0.0) > 0).astype(np.float64)
    x = pulses
    for fc, bw in ((500, 80), (1500, 120), (2500, 200)):
        x = _resonator(x, fc, bw)
    x = x / (np.abs(x).max() + 1e-9)
    rng = np.random.RandomState(seed)
    x = x + 10 ** (noise_db / 20) * rng.randn(n)

    n_frames = 1 + n // HOP
    centers = np.clip(np.arange(n_frames) * HOP, 0, n - 1)
    return x.astype(np.float32), f0[centers].astype(np.float32)


def _run(wav):
    f0, voiced = extract_pitch(jnp.asarray(wav), return_voiced=True)
    return np.asarray(f0), np.asarray(voiced)


def _interior(n_frames, margin=4):
    sl = np.zeros(n_frames, bool)
    sl[margin:-margin] = True
    return sl


class TestVoicedAccuracy:
    @pytest.mark.parametrize(
        "name,f0_fn",
        [
            ("steady_120", lambda t: np.full_like(t, 120.0)),
            ("steady_220", lambda t: np.full_like(t, 220.0)),
            ("vibrato", lambda t: 200.0 + 20.0 * np.sin(2 * np.pi * 5.0 * t)),
            ("glide_up", lambda t: 100.0 + 180.0 * t / t[-1]),
            ("glide_down", lambda t: 320.0 - 200.0 * t / t[-1]),
        ],
    )
    def test_f0_tracks_truth(self, name, f0_fn):
        wav, truth = _glottal(f0_fn, dur=1.0, seed=hash(name) % 2**31)
        f0, voiced = _run(wav)
        inner = _interior(len(truth))

        assert voiced[inner].mean() >= 0.90, f"{name}: voicing recall"
        sel = inner & voiced & (truth > 0)
        err = f0[sel] - truth[sel]
        rmse = float(np.sqrt(np.mean(err**2)))
        bias = float(np.mean(err))
        assert rmse < 6.0, f"{name}: rmse {rmse:.2f} Hz"
        assert abs(bias) < 2.0, f"{name}: bias {bias:.2f} Hz"
        # octave errors: estimate within 20% of truth everywhere voiced
        rel = np.abs(f0[sel] / truth[sel] - 1.0)
        assert (rel < 0.2).all(), (
            f"{name}: octave/gross errors at {np.where(rel >= 0.2)}"
        )


class TestVoicingDecision:
    def test_pure_noise_is_unvoiced(self):
        rng = np.random.RandomState(0)
        wav = rng.randn(SR).astype(np.float32) * 0.1
        f0, voiced = _run(wav)
        assert voiced.mean() < 0.2
        # fully unvoiced signal -> all-zero F0 (reference behavior:
        # _convert_to_continuous_pitch returns zeros when nothing is voiced)
        if not voiced.any():
            assert (f0 == 0).all()

    def test_silence_is_unvoiced(self):
        wav = np.zeros(SR, np.float32)
        f0, voiced = _run(wav)
        assert not voiced.any()
        assert (f0 == 0).all()

    def test_mixed_segments_agree(self):
        """noise | voiced 150 Hz | noise: voicing matches segment layout and
        interpolation fills the unvoiced gaps continuously (reference
        feats.py:99-120)."""
        rng = np.random.RandomState(1)
        voiced_wav, truth = _glottal(
            lambda t: np.full_like(t, 150.0), dur=0.4, seed=1
        )
        noise = (rng.randn(int(0.3 * SR)) * 0.005).astype(np.float32)
        wav = np.concatenate([noise, voiced_wav, noise])
        f0, voiced = _run(wav)

        n_frames = len(f0)
        seg = np.zeros(n_frames, bool)
        lo = int(0.3 * SR) // HOP + 2
        hi = (int(0.3 * SR) + len(voiced_wav)) // HOP - 2
        seg[lo:hi] = True

        agree = (voiced == seg).mean()
        assert agree >= 0.90, f"voicing agreement {agree:.2%}"
        sel = seg & voiced
        rmse = float(np.sqrt(np.mean((f0[sel] - 150.0) ** 2)))
        assert rmse < 6.0
        # interpolated region: continuous, bounded by the voiced value range
        assert (f0 >= 0).all()
        inner_unvoiced = ~seg & (np.arange(n_frames) > lo) & (
            np.arange(n_frames) < hi
        )
        if inner_unvoiced.any():
            assert np.all(np.abs(f0[inner_unvoiced] - 150.0) < 30.0)


class TestContinuousPitchHost:
    def test_matches_reference_semantics(self):
        """Host-side completion (ops/pitch.py:continuous_pitch_np) follows
        reference feats.py:92-112: edge fill + interior linear interp."""
        from emotivoice_tpu.ops.pitch import continuous_pitch_np

        f0 = np.array([0.0, 0.0, 100.0, 0.0, 0.0, 130.0, 0.0], np.float64)
        np.testing.assert_allclose(
            continuous_pitch_np(f0),
            [100.0, 100.0, 100.0, 110.0, 120.0, 130.0, 130.0],
        )
        assert (continuous_pitch_np(np.zeros(5)) == 0).all()

    def test_agrees_with_device_interpolation(self):
        """The jnp scan (_interp_unvoiced) and the host numpy path implement
        the same completion."""
        from emotivoice_tpu.ops.pitch import _interp_unvoiced

        rng = np.random.RandomState(3)
        f0 = np.where(rng.rand(64) < 0.5, 0.0, 100 + 50 * rng.rand(64))
        ours = np.asarray(
            _interp_unvoiced(jnp.asarray(f0, jnp.float32),
                             jnp.asarray(f0 > 0))
        )
        from emotivoice_tpu.ops.pitch import continuous_pitch_np

        np.testing.assert_allclose(ours, continuous_pitch_np(f0), rtol=1e-5)


class TestZScoreSanity:
    def test_normalized_range_on_speechlike_corpus(self):
        """z-scored targets for a plausible F0 corpus fall in a sane range —
        guards against a systematic scale/shift that would silently poison
        the pitch-predictor targets."""
        from emotivoice_tpu.ops.pitch import normalize_pitch

        outs = []
        for i, base in enumerate((120.0, 180.0, 240.0, 320.0)):
            wav, _ = _glottal(
                lambda t: base + 10 * np.sin(2 * np.pi * 4 * t), 0.5, seed=i
            )
            f0, voiced = _run(wav)
            outs.append(np.asarray(normalize_pitch(jnp.asarray(f0)))[voiced])
        z = np.concatenate(outs)
        assert np.abs(z).max() < 4.0  # within 4 sigma of the corpus stats
        assert -3.0 < z.mean() < 3.0
