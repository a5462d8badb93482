"""DSP golden tests: STFT vs torch.stft, mel filterbank invariants, pitch."""

import numpy as np
import pytest
import jax.numpy as jnp

from emotivoice_tpu.ops import mel as mel_ops
from emotivoice_tpu.ops import stft as stft_ops
from emotivoice_tpu.ops.pitch import extract_pitch

torch = pytest.importorskip("torch")

SR, N_FFT, HOP, WIN = 16000, 1024, 256, 1024


def _signal(t=16384, seed=0):
    rng = np.random.RandomState(seed)
    n = np.arange(t) / SR
    sig = (
        0.5 * np.sin(2 * np.pi * 220 * n)
        + 0.2 * np.sin(2 * np.pi * 660 * n)
        + 0.05 * rng.randn(t)
    )
    return (sig / np.abs(sig).max() * 0.95).astype(np.float32)


class TestSTFT:
    def test_matches_torch_stft_center(self):
        x = _signal()
        ours = np.asarray(
            stft_ops.stft_magnitude(jnp.asarray(x), N_FFT, HOP, WIN, center=True)
        )
        ref = torch.stft(
            torch.from_numpy(x),
            N_FFT,
            hop_length=HOP,
            win_length=WIN,
            window=torch.hann_window(WIN),
            center=True,
            pad_mode="reflect",
            return_complex=True,
        ).abs().numpy()
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, atol=1e-3, rtol=1e-3)

    def test_rfft_and_matmul_methods_agree(self):
        x = _signal(8192)
        a = stft_ops.stft_magnitude(jnp.asarray(x), N_FFT, HOP, WIN, method="matmul")
        b = stft_ops.stft_magnitude(jnp.asarray(x), N_FFT, HOP, WIN, method="rfft")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0.15)

    def test_loss_mode_matches_reference_semantics(self):
        """loss_mode: pre-pad (n_fft-hop)//2, center=False, sqrt(p+1e-6)."""
        x = _signal(8192)  # multiple of hop -> exactly T//hop frames
        ours = np.asarray(
            stft_ops.stft_magnitude(jnp.asarray(x), N_FFT, HOP, WIN, loss_mode=True)
        )
        assert ours.shape[-1] == 8192 // HOP
        y = torch.nn.functional.pad(
            torch.from_numpy(x)[None, None],
            (int((N_FFT - HOP) / 2), int((N_FFT - HOP) / 2)),
            mode="reflect",
        ).squeeze(1)
        spec = torch.stft(
            y,
            N_FFT,
            hop_length=HOP,
            win_length=WIN,
            window=torch.hann_window(WIN),
            center=False,
            return_complex=True,
        )
        ref = torch.sqrt(spec.abs() ** 2 + 1e-6).numpy()[0]
        np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)

    def test_istft_roundtrip(self):
        x = _signal(8192)
        frames = stft_ops.stft_magnitude(
            jnp.asarray(x), N_FFT, HOP, WIN, center=True, method="rfft"
        )
        # Recompute complex spectrum for phase.
        xp = jnp.pad(jnp.asarray(x)[None], ((0, 0), (N_FFT // 2, N_FFT // 2)), "reflect")
        fr = stft_ops.frame_signal(xp, N_FFT, HOP) * jnp.asarray(
            stft_ops.hann_window(WIN)
        )
        spec = jnp.fft.rfft(fr, axis=-1)
        phase = jnp.swapaxes(jnp.angle(spec), -1, -2)
        rec = np.asarray(
            stft_ops.istft(frames, phase, N_FFT, HOP, WIN)
        )[0]
        n = min(len(rec), len(x))
        err = np.abs(rec[HOP : n - HOP] - x[HOP : n - HOP]).max()
        assert err < 1e-3, err


class TestMel:
    def test_filterbank_invariants(self):
        fb = mel_ops.mel_filterbank(SR, N_FFT, 80, 0.0, 8000.0)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        # Every filter has support, peaks are monotonically increasing in bin.
        peaks = fb.argmax(axis=1)
        assert (np.diff(peaks) >= 0).all()
        assert fb.sum(axis=1).min() > 0
        # Slaney norm: filter areas ~ equal (2/bandwidth weighting).
        mel_pts = mel_ops.mel_to_hz(
            np.linspace(mel_ops.hz_to_mel(0.0), mel_ops.hz_to_mel(8000.0), 82)
        )
        df = SR / 2 / (N_FFT // 2)
        areas = fb.sum(axis=1) * df
        # Triangle area * slaney norm == ~1 (up to discretization).
        np.testing.assert_allclose(areas[5:-5], 1.0, atol=0.1)

    def test_hz_mel_roundtrip(self):
        f = np.array([0.0, 123.0, 999.0, 1000.0, 4567.0, 8000.0])
        np.testing.assert_allclose(mel_ops.mel_to_hz(mel_ops.hz_to_mel(f)), f, rtol=1e-9)

    def test_known_librosa_values(self):
        """Spot-check against librosa.mel_frequencies(n_mels=40) (the values
        in librosa's published docstring, fmin=0 fmax=11025)."""
        got = mel_ops.mel_to_hz(
            np.linspace(mel_ops.hz_to_mel(0.0), mel_ops.hz_to_mel(11025.0), 40)
        )
        expect_head = np.array([0.0, 85.317, 170.635, 255.952])
        np.testing.assert_allclose(got[:4], expect_head, atol=0.1)
        np.testing.assert_allclose(got[-1], 11025.0, rtol=1e-6)
        # Log region boundary: step ratio becomes geometric above 1 kHz.
        ratios = got[25:] / got[24:-1]
        np.testing.assert_allclose(ratios, ratios[0], rtol=1e-3)

    def test_log_mel_shapes_and_range(self):
        x = _signal()
        m = np.asarray(mel_ops.mel_spectrogram(jnp.asarray(x)))
        assert m.shape == (80, 1 + 16384 // HOP)
        assert m.min() >= np.log(1e-5) - 1e-6
        m_loss = np.asarray(mel_ops.mel_spectrogram(jnp.asarray(x), loss_mode=True))
        assert m_loss.shape == (80, 16384 // HOP)


class TestPitch:
    def test_pure_tone(self):
        for f0 in [110.0, 220.0, 330.0]:
            t = np.arange(16384) / SR
            x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
            p = np.asarray(extract_pitch(jnp.asarray(x)))
            mid = p[8:-8]
            assert np.abs(np.median(mid) - f0) < 3.0, (f0, np.median(mid))

    def test_silence_is_zero(self):
        x = np.zeros(8192, np.float32)
        p = np.asarray(extract_pitch(jnp.asarray(x)))
        assert np.allclose(p, 0.0)

    def test_unvoiced_gap_interpolated(self):
        t = np.arange(16384) / SR
        x = np.sin(2 * np.pi * 200 * t).astype(np.float32)
        x[6000:9000] = 0.0  # silence gap
        p = np.asarray(extract_pitch(jnp.asarray(x)))
        assert (p > 0).all()  # interpolation fills the gap
        assert np.abs(np.median(p) - 200.0) < 5.0

    def test_batched(self):
        x = np.stack([_signal(8192, s) for s in range(3)])
        p = np.asarray(extract_pitch(jnp.asarray(x)))
        assert p.shape == (3, 1 + 8192 // HOP)


class TestGriffinLim:
    def test_reconstructs_sine(self):
        import jax.numpy as jnp

        from emotivoice_tpu.ops.stft import griffin_lim, stft_magnitude

        sr, n_fft, hop = 16000, 1024, 256
        t = np.arange(sr, dtype=np.float32) / sr
        wav = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
        mag = stft_magnitude(jnp.asarray(wav), n_fft, hop, n_fft)
        rec = np.asarray(griffin_lim(mag, n_iter=16, n_fft=n_fft,
                                     hop_length=hop, win_length=n_fft))[0]
        n = min(len(rec), len(wav))
        a, b = rec[hop:n - hop], wav[hop:n - hop]
        # phase-blind metric: spectra must match closely
        ma = np.asarray(stft_magnitude(jnp.asarray(a), n_fft, hop, n_fft))
        mb = np.asarray(stft_magnitude(jnp.asarray(b), n_fft, hop, n_fft))
        err = np.abs(ma - mb).sum() / np.abs(mb).sum()
        assert err < 0.2, err  # zero-phase init converges slowly on pure tones
        # amplitude recovered (0.5 sine -> rms 0.354)
        assert abs(np.sqrt((a ** 2).mean()) - 0.354) < 0.02

    def test_mel_roundtrip_energy(self):
        import jax.numpy as jnp

        from emotivoice_tpu.ops.mel import mel_spectrogram, mel_to_linear
        from emotivoice_tpu.ops.stft import stft_magnitude

        sr = 16000
        t = np.arange(sr // 2, dtype=np.float32) / sr
        wav = (0.3 * np.sin(2 * np.pi * 220.0 * t)
               + 0.2 * np.sin(2 * np.pi * 1200.0 * t)).astype(np.float32)
        mel = mel_spectrogram(jnp.asarray(wav)[None], sr, 1024, 256, 1024, 80,
                              0.0, 8000.0)
        lin = np.asarray(mel_to_linear(mel, sr))
        ref = np.asarray(stft_magnitude(jnp.asarray(wav)[None], 1024, 256, 1024))
        # dominant bins should carry most of the energy in both
        top_ref = np.argsort(ref.sum(-1)[0])[-4:]
        top_inv = np.argsort(lin.sum(-1)[0])[-4:]
        assert len(set(top_ref) & set(top_inv)) >= 2
