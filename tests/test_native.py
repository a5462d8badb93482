"""Native C++ audio runtime vs pure-Python reference implementations.

Skipped entirely when the library can't be built (no g++)."""

import numpy as np
import pytest
from scipy.io import wavfile

from emotivoice_tpu.utils import native
from emotivoice_tpu.utils.audio_io import (
    _trim_silence_py,
    read_wav,
    resample,
    trim_silence,
    write_wav,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture()
def sine():
    t = np.arange(16000, dtype=np.float32) / 16000
    return (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)


class TestNativeWav:
    def test_write_read_roundtrip_matches_scipy(self, sine, tmp_path):
        path = str(tmp_path / "a.wav")
        write_wav(path, sine, 16000)
        sr, wav = read_wav(path)
        assert sr == 16000
        # int16 quantization only
        np.testing.assert_allclose(wav, sine, atol=1.0 / 32768 + 1e-7)
        sr2, raw = wavfile.read(path)
        np.testing.assert_array_equal(
            raw, np.clip(sine * 32768, -32768, 32767).astype(np.int16)
        )

    def test_read_stereo_mixes_to_mono(self, sine, tmp_path):
        path = str(tmp_path / "st.wav")
        stereo = np.stack([sine, -sine], axis=1)
        wavfile.write(path, 16000, (stereo * 32767).astype(np.int16))
        _, wav = read_wav(path)
        assert wav.ndim == 1
        assert np.abs(wav).max() < 1e-4  # channels cancel

    def test_float32_wav(self, sine, tmp_path):
        path = str(tmp_path / "f.wav")
        wavfile.write(path, 16000, sine)  # IEEE float format
        sr, wav = read_wav(path)
        np.testing.assert_allclose(wav, sine, atol=1e-6)


class TestNativeTrim:
    def test_matches_python(self, sine):
        pad = np.zeros(4000, np.float32)
        sig = np.concatenate([pad, sine, pad])
        got = trim_silence(sig, 16000)
        ref = _trim_silence_py(sig, 16000, 0.005, 50.0, np.abs(sig).max())
        np.testing.assert_array_equal(got, ref)

    def test_all_silent_untouched(self):
        sig = np.zeros(1000, np.float32)
        assert len(trim_silence(sig, 16000)) == 1000


class TestNativeResample:
    @pytest.mark.parametrize("sr_in", [48000, 22050, 44100])
    def test_close_to_scipy_polyphase(self, sr_in):
        from scipy.signal import resample_poly

        t = np.arange(sr_in, dtype=np.float64) / sr_in
        x = (
            0.4 * np.sin(2 * np.pi * 440 * t)
            + 0.2 * np.sin(2 * np.pi * 1700 * t)
        ).astype(np.float32)
        y = resample(x, sr_in, 16000)
        from math import gcd

        g = gcd(16000, sr_in)
        y_ref = resample_poly(x, 16000 // g, sr_in // g).astype(np.float32)
        n = min(len(y), len(y_ref))
        # ignore filter edge transients
        err = np.abs(y[200 : n - 200] - y_ref[200 : n - 200]).max()
        assert err < 5e-3, err

    def test_identity(self, ):
        x = np.random.RandomState(0).randn(1000).astype(np.float32)
        np.testing.assert_array_equal(resample(x, 16000, 16000), x)
