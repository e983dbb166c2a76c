"""Native C++ wavio runtime tests (skipped if g++ unavailable)."""
import numpy as np
import pytest

from chatterbox_tpu import runtime


@pytest.fixture(scope="module")
def lib():
    l = runtime.get_lib()
    if l is None:
        pytest.skip("native toolchain unavailable")
    return l


class TestWavIO:
    def test_roundtrip(self, lib, tmp_path):
        rng = np.random.default_rng(0)
        wav = (rng.standard_normal(24000) * 0.1).astype(np.float32)
        p = str(tmp_path / "x.wav")
        assert runtime.write_wav(p, wav, 24000)
        out, sr = runtime.read_wav(p)
        assert sr == 24000
        np.testing.assert_allclose(out, wav, atol=1e-7)

    def test_reads_scipy_written_pcm16(self, lib, tmp_path):
        from scipy.io import wavfile
        rng = np.random.default_rng(1)
        wav = (rng.standard_normal(8000) * 0.2).clip(-1, 1)
        p = str(tmp_path / "pcm.wav")
        wavfile.write(p, 16000, (wav * 32767).astype(np.int16))
        out, sr = runtime.read_wav(p)
        assert sr == 16000
        np.testing.assert_allclose(out, wav, atol=1e-3)

    def test_stereo_downmix(self, lib, tmp_path):
        from scipy.io import wavfile
        l = np.ones(100, np.float32) * 0.5
        r = np.zeros(100, np.float32)
        p = str(tmp_path / "st.wav")
        wavfile.write(p, 16000, np.stack([l, r], axis=1))
        out, sr = runtime.read_wav(p)
        np.testing.assert_allclose(out, np.full(100, 0.25), atol=1e-6)

    def test_pcm16(self, lib):
        wav = np.asarray([0.0, 0.5, -0.5, 2.0, -2.0], np.float32)
        out = runtime.pcm16(wav)
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out, [0, 16383, -16383, 32767, -32767])

    def test_audio_io_uses_native(self, lib, tmp_path):
        from chatterbox_tpu.utils.audio_io import load_audio, save_wav
        rng = np.random.default_rng(2)
        wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)
        p = str(tmp_path / "io.wav")
        save_wav(p, wav, 16000)
        out = load_audio(p, 16000)
        np.testing.assert_allclose(out, wav, atol=1e-6)
