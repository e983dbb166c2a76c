"""Utility subsystem tests: profiling/metrics, loudness, dtype policy."""
import math
import time

import numpy as np
import jax.numpy as jnp

from chatterbox_tpu.utils.profiling import Metrics, stage
from chatterbox_tpu.utils.loudness import integrated_loudness, norm_loudness
from chatterbox_tpu.utils.dtypes import cast_params, param_count, param_bytes


class TestMetrics:
    def test_stage_timing_and_report(self):
        m = Metrics()
        with stage("work", m):
            time.sleep(0.01)
        with stage("work", m):
            time.sleep(0.01)
        m.count("requests", 2)
        rep = m.report()
        assert rep["work"]["count"] == 2
        assert rep["work"]["total_s"] >= 0.02
        assert rep["requests"] == 2

    def test_xrt(self):
        m = Metrics()
        m.add_stage("t3", 0.5)
        m.add_stage("s3gen", 0.5)
        assert m.xrt(10.0, "t3", "s3gen") == 10.0


class TestLoudness:
    def test_sine_loudness_reasonable(self):
        """A full-scale 1 kHz sine is ~-3 LUFS; -20 dB down is ~-23 LUFS."""
        sr = 24000
        t = np.arange(sr * 3) / sr
        sine = 0.1 * np.sin(2 * np.pi * 1000 * t)
        l = integrated_loudness(sine, sr)
        assert -26 < l < -20

    def test_norm_to_target(self):
        sr = 24000
        t = np.arange(sr * 3) / sr
        sine = (0.05 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        out = norm_loudness(sine, sr, target_lufs=-27.0)
        assert abs(integrated_loudness(out, sr) - (-27.0)) < 0.5

    def test_silence_guarded(self):
        out = norm_loudness(np.zeros(24000, np.float32), 24000)
        assert np.all(out == 0)


class TestDtypes:
    def test_cast_and_count(self):
        params = {"a": {"w": jnp.ones((4, 4)), "ids": jnp.zeros((3,), jnp.int32)}}
        c = cast_params(params, jnp.bfloat16)
        assert c["a"]["w"].dtype == jnp.bfloat16
        assert c["a"]["ids"].dtype == jnp.int32   # ints untouched
        assert param_count(params) == 19
        assert param_bytes(params) == 16 * 4 + 3 * 4
