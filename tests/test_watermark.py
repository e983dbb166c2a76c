"""Built-in spread-spectrum watermark: embed + detect round trip and
robustness (capability matched: ref README.md:173-198 — perth watermarks
every output and survives edits)."""
import numpy as np
import pytest

from chatterbox_tpu.utils.watermark import (
    SpreadSpectrumWatermarker, Watermarker, DETECT_Z)

SR = 24000


def speechy(seconds=4.0, seed=0, sr=SR):
    """Speech-like test signal: harmonics with slow AM + noise bursts."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sr)) / sr
    f0 = 140 + 20 * np.sin(2 * np.pi * 0.7 * t)
    x = sum(0.25 / k * np.sin(2 * np.pi * k * np.cumsum(f0) / sr)
            for k in range(1, 6))
    am = 0.4 + 0.6 * (np.sin(2 * np.pi * 2.1 * t) > -0.4)
    return (x * am + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


@pytest.fixture(scope="module")
def wm():
    return SpreadSpectrumWatermarker()


class TestRoundTrip:
    def test_detects_after_embed(self, wm):
        marked = wm.apply_watermark(speechy(), sample_rate=SR)
        assert wm.get_watermark(marked, sample_rate=SR) == 1.0
        assert wm.detection_score(marked, SR) >= DETECT_Z

    def test_clean_audio_not_detected(self, wm):
        assert wm.get_watermark(speechy(seed=3), sample_rate=SR) == 0.0

    def test_wrong_key_not_detected(self, wm):
        marked = wm.apply_watermark(speechy(), sample_rate=SR)
        other = SpreadSpectrumWatermarker(key="someone-else")
        assert other.get_watermark(marked, sample_rate=SR) == 0.0

    def test_inaudibility_bound(self, wm):
        x = speechy()
        marked = wm.apply_watermark(x, sample_rate=SR)
        delta = marked - x
        snr_db = 10 * np.log10(np.mean(x ** 2) / (np.mean(delta ** 2) + 1e-20))
        assert snr_db > 20.0   # watermark well below the program material

    def test_silence_stays_silent(self, wm):
        x = np.zeros(SR, np.float32)
        marked = wm.apply_watermark(x, sample_rate=SR)
        assert np.max(np.abs(marked)) < 1e-4   # envelope-shaped → no hiss

    def test_short_input_passthrough(self, wm):
        x = np.ones(100, np.float32) * 0.1
        np.testing.assert_array_equal(wm.apply_watermark(x, sample_rate=SR), x)


class TestRobustness:
    def test_survives_16k_resample_roundtrip(self, wm):
        from chatterbox_tpu.audio.resample import resample
        import jax.numpy as jnp
        marked = wm.apply_watermark(speechy(5.0), sample_rate=SR)
        down = np.asarray(resample(jnp.asarray(marked), SR, 16000))
        # detect at 16 kHz directly (receiver may never upsample back)
        assert wm.get_watermark(down, sample_rate=16000) == 1.0
        back = np.asarray(resample(jnp.asarray(down), 16000, SR))
        assert wm.get_watermark(back, sample_rate=SR) == 1.0

    def test_survives_8bit_requantize(self, wm):
        marked = wm.apply_watermark(speechy(5.0), sample_rate=SR)
        q = np.round(np.clip(marked, -1, 1) * 127.0) / 127.0
        assert wm.get_watermark(q.astype(np.float32), sample_rate=SR) == 1.0

    def test_survives_clip_offset(self, wm):
        """Detection with an arbitrary clip start (unknown phase)."""
        marked = wm.apply_watermark(speechy(6.0), sample_rate=SR)
        clip = marked[SR // 3: SR // 3 + 3 * SR]
        assert wm.get_watermark(clip, sample_rate=SR) == 1.0

    def test_worst_case_noise_content(self, wm):
        """Broadband-noise program material is the hardest content (flat
        whitened spectrum competes with the chips) — must still detect."""
        rng = np.random.default_rng(11)
        x = (0.1 * rng.standard_normal(4 * SR)).astype(np.float32)
        marked = wm.apply_watermark(x, sample_rate=SR)
        assert wm.get_watermark(marked, sample_rate=SR) == 1.0
        assert wm.get_watermark(x, sample_rate=SR) == 0.0

    def test_chunked_embed_matches_stream(self, wm):
        """Phase-continuous chunked embedding (generate_stream's usage)."""
        x = speechy(4.0)
        n1 = len(x) // 3
        a = wm.apply_watermark(x[:n1], sample_rate=SR, offset=0)
        b = wm.apply_watermark(x[n1:], sample_rate=SR, offset=n1)
        joined = np.concatenate([a, b])
        assert wm.get_watermark(joined, sample_rate=SR) == 1.0

    def test_battery_margin_two_x_threshold(self, wm):
        """Every ≥4 s robustness-battery case must clear TWICE the
        ROC-derived threshold (r4 verdict criterion) — the margin no longer
        rides on a single lucky clip."""
        from chatterbox_tpu.audio.resample import resample
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        cases = {
            "speech": wm.apply_watermark(speechy(4.0), sample_rate=SR),
            "noise": wm.apply_watermark(
                (0.1 * rng.standard_normal(4 * SR)).astype(np.float32),
                sample_rate=SR),
        }
        cases["requant"] = (np.round(np.clip(cases["speech"], -1, 1)
                                     * 127.0) / 127.0).astype(np.float32)
        cases["resampled"] = np.asarray(resample(jnp.asarray(
            wm.apply_watermark(speechy(5.0), sample_rate=SR)), SR, 16000))
        for name, x in cases.items():
            sr = 16000 if name == "resampled" else SR
            z = wm.detection_score(x, sr)
            assert z >= 2 * DETECT_Z, (name, z)


class TestPayload:
    """16-bit payload via per-block chip-sign keying: detection stays
    payload-invariant; the decoded bits identify the generator (closer to
    perth's implicit data-carrying mark, ref README.md:178-198)."""

    def test_round_trip(self, wm):
        m = wm.apply_watermark(speechy(4.0), sample_rate=SR, payload=0xBEEF)
        z, p = wm.detect(m, SR)
        assert z >= DETECT_Z and p == 0xBEEF
        assert wm.get_payload(m, sample_rate=SR) == 0xBEEF

    def test_default_payload_is_all_ones(self, wm):
        """payload=None embeds the legacy unmodulated sequence."""
        m = wm.apply_watermark(speechy(4.0), sample_rate=SR)
        assert wm.get_payload(m, sample_rate=SR) == wm.DEFAULT_PAYLOAD

    def test_survives_16k_resample(self, wm):
        from chatterbox_tpu.audio.resample import resample
        import jax.numpy as jnp
        m = wm.apply_watermark(speechy(5.0), sample_rate=SR, payload=0x1234)
        down = np.asarray(resample(jnp.asarray(m), SR, 16000))
        z, p = wm.detect(down, 16000)
        assert z >= DETECT_Z and p == 0x1234

    def test_distinct_payloads_distinct(self, wm):
        x = speechy(4.0)
        pa = wm.get_payload(wm.apply_watermark(x, sample_rate=SR,
                                               payload=0x00FF),
                            sample_rate=SR)
        pb = wm.get_payload(wm.apply_watermark(x, sample_rate=SR,
                                               payload=0xAA55),
                            sample_rate=SR)
        assert pa == 0x00FF and pb == 0xAA55

    def test_payload_out_of_range_raises(self, wm):
        with pytest.raises(ValueError):
            wm.apply_watermark(speechy(2.0), sample_rate=SR, payload=1 << 16)


class TestPipelinesUseIt:
    def test_watermarker_never_identity(self):
        w = Watermarker()
        x = speechy(3.0)
        marked = w.apply_watermark(x, sample_rate=SR)
        assert not np.array_equal(marked, x)
        assert w.get_watermark(marked, sample_rate=SR) == 1.0


class TestWatermarkCLI:
    def test_detect_command(self, wm, tmp_path, capsys):
        """`cli watermark` reports detection for marked audio and rejects
        clean audio (the reference documents the same extraction flow via
        perth, ref: README.md:178-198)."""
        import json
        from chatterbox_tpu.cli import main
        from chatterbox_tpu.utils.audio_io import save_wav
        x = speechy(5.0)
        marked = tmp_path / "m.wav"
        clean = tmp_path / "c.wav"
        save_wav(str(marked), wm.apply_watermark(x, sample_rate=SR), SR)
        save_wav(str(clean), x, SR)
        main(["watermark", str(marked)])
        rep = json.loads(capsys.readouterr().out)
        assert rep["detected"] is True and rep["score_z"] >= rep["threshold_z"]
        main(["watermark", str(clean)])
        rep = json.loads(capsys.readouterr().out)
        assert rep["detected"] is False
