"""pyworld cross-validation of the on-device pitch extractor.

Skipped wherever pyworld isn't installed (it isn't in this image); on any
machine that has it, these tests automatically verify that `ops/pitch.py`
agrees with the reference's exact DIO+StoneMask path
(`/root/reference/models/prompt_tts_modified/feats.py:115-130`):
voicing agreement >= 90% and voiced-frame RMSE within a few Hz on the same
synthetic speech-like corpus used by tests/test_pitch_golden.py, plus a
FeatureExtractor run with `pitch_backend="pyworld"` for users who want
bit-level reference pitch targets.
"""

import numpy as np
import pytest
import jax.numpy as jnp

pyworld = pytest.importorskip("pyworld")

from emotivoice_tpu.ops.pitch import (  # noqa: E402
    extract_pitch,
    extract_pitch_pyworld,
)
from tests.test_pitch_golden import _glottal, _interior  # noqa: E402

SR = 16000
HOP = 256


def _dio_voicing(wav):
    """Raw DIO+StoneMask voicing mask (f0 > 0 before interpolation)."""
    x = np.asarray(wav, np.float64)
    f0, t = pyworld.dio(x, fs=SR, frame_period=1000.0 * HOP / SR)
    f0 = pyworld.stonemask(x, f0, t, SR)
    return f0 > 0


@pytest.mark.parametrize(
    "name,f0_fn",
    [
        ("steady_120", lambda t: np.full_like(t, 120.0)),
        ("steady_220", lambda t: np.full_like(t, 220.0)),
        ("vibrato", lambda t: 200.0 + 20.0 * np.sin(2 * np.pi * 5.0 * t)),
        ("glide_up", lambda t: 100.0 + 180.0 * t / t[-1]),
    ],
)
def test_jax_extractor_matches_pyworld(name, f0_fn):
    wav, _ = _glottal(f0_fn, dur=1.0, seed=hash(name) % 2**31)
    ours, voiced = extract_pitch(jnp.asarray(wav), return_voiced=True)
    ours, voiced = np.asarray(ours), np.asarray(voiced)
    ref = extract_pitch_pyworld(wav, SR, HOP)
    ref_voiced = _dio_voicing(wav)

    n = min(len(ours), len(ref))
    inner = _interior(n)
    agree = (voiced[:n] == ref_voiced[:n])[inner].mean()
    assert agree >= 0.90, f"{name}: voicing agreement {agree:.2%}"

    both = inner & voiced[:n] & ref_voiced[:n]
    err = ours[:n][both] - ref[:n][both]
    rmse = float(np.sqrt(np.mean(err**2)))
    assert rmse < 8.0, f"{name}: voiced RMSE vs pyworld {rmse:.2f} Hz"


def test_feature_extractor_pyworld_backend():
    import dataclasses

    from emotivoice_tpu.config import EmotiVoiceConfig
    from emotivoice_tpu.data.dataset import FeatureExtractor

    cfg = EmotiVoiceConfig()
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, pitch_backend="pyworld")
    )
    wav, _ = _glottal(lambda t: np.full_like(t, 150.0), dur=0.5, seed=7)
    feats = FeatureExtractor(cfg)("utt", wav)
    n = feats["mel"].shape[0]
    assert feats["pitch"].shape == (n,)
    # z-scored pyworld pitch should live in a sane corpus range
    assert np.abs(feats["pitch"]).max() < 6.0
