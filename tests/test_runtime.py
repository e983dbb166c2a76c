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


class TestWavLoader:
    """Threaded native data loader (runtime/dataload.cpp)."""

    def _make(self, tmp_path, n=10):
        from chatterbox_tpu.utils.audio_io import save_wav
        paths = []
        for i in range(n):
            w = (0.1 * np.sin(np.arange(800 + 50 * i) * 0.05)).astype(np.float32)
            p = tmp_path / f"{i}.wav"
            save_wav(str(p), w, 16000)
            paths.append(p)
        return paths

    def test_native_loads_all_epochs(self, tmp_path):
        if runtime.get_dataload_lib() is None:
            pytest.skip("no native toolchain")
        paths = self._make(tmp_path)
        ld = runtime.WavLoader(paths, n_threads=3, max_frames=4000, epochs=2,
                               seed=1)
        assert ld.native
        items = list(ld)
        assert len(items) == 20
        # every file appears exactly twice
        counts = np.bincount([pid for _, pid in items], minlength=10)
        assert (counts == 2).all()
        ld.close()

    def test_unreadable_files_skipped(self, tmp_path):
        if runtime.get_dataload_lib() is None:
            pytest.skip("no native toolchain")
        paths = self._make(tmp_path, n=4) + [tmp_path / "nope.wav"]
        ld = runtime.WavLoader(paths, n_threads=2, max_frames=4000, epochs=1)
        assert len(list(ld)) == 4
        assert ld.errors() == 1

    def test_no_drop_at_epoch_exhaustion(self, tmp_path):
        """Regression: a worker that observed epoch exhaustion in claim()
        used to set `done`, and a PEER still holding its final decoded clip
        would see it in the push gate and drop the item (flaky 3-of-4
        delivery under n_threads=2). Delivery must be complete every time;
        only dl_destroy may abandon work."""
        if runtime.get_dataload_lib() is None:
            pytest.skip("no native toolchain")
        paths = self._make(tmp_path, n=4)
        for it in range(60):
            ld = runtime.WavLoader(paths, n_threads=2, max_frames=4000,
                                   epochs=1, seed=it)
            got = sorted(pid for _, pid in ld)
            assert got == [0, 1, 2, 3], f"iteration {it}: {got}"
            ld.close()

    def test_single_thread_order_deterministic(self, tmp_path):
        if runtime.get_dataload_lib() is None:
            pytest.skip("no native toolchain")
        paths = self._make(tmp_path)
        a = [p for _, p in runtime.WavLoader(paths, n_threads=1,
                                             max_frames=4000, seed=7)]
        b = [p for _, p in runtime.WavLoader(paths, n_threads=1,
                                             max_frames=4000, seed=7)]
        c = [p for _, p in runtime.WavLoader(paths, n_threads=1,
                                             max_frames=4000, seed=8)]
        assert a == b and sorted(a) == list(range(10))
        assert a != c   # different seed, different shuffle

    def test_max_frames_crops(self, tmp_path):
        if runtime.get_dataload_lib() is None:
            pytest.skip("no native toolchain")
        paths = self._make(tmp_path)
        for w, _ in runtime.WavLoader(paths, n_threads=2, max_frames=600):
            assert len(w) == 600

    def test_batched_wavs_padding(self, tmp_path):
        if runtime.get_dataload_lib() is None:
            pytest.skip("no native toolchain")
        paths = self._make(tmp_path)
        ld = runtime.WavLoader(paths, n_threads=2, max_frames=4000, seed=0)
        batches = list(runtime.batched_wavs(ld, 4))
        assert sum(b[0].shape[0] for b in batches) == 10
        for wavs, lens, pids in batches:
            assert wavs.shape[1] == lens.max()
            for i, L in enumerate(lens):
                assert (wavs[i, L:] == 0).all()

    def test_python_fallback(self, tmp_path, monkeypatch):
        paths = self._make(tmp_path, n=5)
        monkeypatch.setattr(runtime, "get_dataload_lib", lambda: None)
        ld = runtime.WavLoader(paths, max_frames=4000, epochs=1, seed=3)
        assert not ld.native
        items = list(ld)
        assert len(items) == 5
        assert sorted(p for _, p in items) == list(range(5))
