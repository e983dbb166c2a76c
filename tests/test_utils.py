"""Utility subsystem tests: profiling/metrics, loudness, dtype policy."""
import math
import os
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


class TestJaxCache:
    """Compile-cache hardening (utils/jaxcache.py): this checkout is shared
    by heterogeneous machines, XLA:CPU executables are ISA-specific, cache
    writes must survive kills, and XLA:CPU's serialize() crashes flakily —
    see the module docstring for the three observed failure modes."""

    def test_cpu_scoped_dir_stable_and_distinct(self, tmp_path):
        from chatterbox_tpu.utils.jaxcache import cpu_scoped_dir
        a = cpu_scoped_dir(str(tmp_path))
        b = cpu_scoped_dir(str(tmp_path))
        assert a == b and os.path.isdir(a)
        assert os.path.basename(a).startswith("cpu-")
        assert len(os.path.basename(a)) == 4 + 12   # cpu-<12 hex>

    def test_atomic_put_no_partial_entry(self, tmp_path):
        """The patched LRUCache.put leaves either the full entry or nothing;
        tmp files never linger."""
        from chatterbox_tpu.utils.jaxcache import atomic_cache_writes
        atomic_cache_writes()
        from jax._src import lru_cache as lc
        c = lc.LRUCache(str(tmp_path), max_size=-1)
        c.put("k1", b"x" * 4096)
        assert c.get("k1") == b"x" * 4096
        leftovers = [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
        assert leftovers == []

    def test_forked_write_crash_skips_entry(self, tmp_path, monkeypatch):
        """A native crash inside the cache write (the flaky XLA:CPU
        serialize SIGSEGV) must skip the entry, not kill the process."""
        import warnings as W
        from chatterbox_tpu.utils import jaxcache
        jaxcache.forked_cache_writes()
        from jax._src import compilation_cache as cc

        class _Boom:
            platform = "cpu"
        calls = []

        def exploding_orig(*a, **kw):
            calls.append(a)
            os.kill(os.getpid(), 11)      # simulate the serialize SIGSEGV

        # the wrapper closed over the original; rebind via a fresh wrapper
        monkeypatch.setattr(jaxcache, "_FORKED", False)
        monkeypatch.setattr(cc, "put_executable_and_time", exploding_orig)
        jaxcache.forked_cache_writes(timeout_s=30.0)
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            cc.put_executable_and_time("key", "mod", object(), _Boom(), 1)
        assert calls == []                # parent never ran the original
        assert any("skipped" in str(w.message) for w in rec)

    def test_verified_read_deletes_poison_entry(self, tmp_path, monkeypatch):
        """A cache entry whose deserialize ABORTS (well-formed garbage from
        the serialize race) must be deleted and reported as a miss — not
        kill the process (the observed full-suite 'Fatal Python error:
        Aborted' inside get_executable_and_time)."""
        import pathlib
        import warnings as W
        from chatterbox_tpu.utils import jaxcache
        from jax._src import compilation_cache as cc

        entry = tmp_path / "kp-cache"
        entry.write_bytes(b"garbage")

        class _Cache:
            path = pathlib.Path(tmp_path)

        class _Cpu:
            platform = "cpu"

        def aborting_orig(*a, **kw):
            os.kill(os.getpid(), 6)       # deserialize_executable's abort

        monkeypatch.setattr(jaxcache, "_VERIFIED", False)
        monkeypatch.setattr(cc, "get_executable_and_time", aborting_orig)
        monkeypatch.setattr(cc, "_get_cache", lambda backend: _Cache())
        jaxcache.verified_cache_reads(timeout_s=30.0)
        with W.catch_warnings(record=True) as rec:
            W.simplefilter("always")
            out = cc.get_executable_and_time("kp", None, _Cpu(), None)
        assert out == (None, None)
        assert not entry.exists()         # poison entry removed
        assert any("deleted" in str(w.message) for w in rec)
        assert not (tmp_path / ".verified" / "kp").exists()

    def test_verified_read_marks_and_skips_probe(self, tmp_path, monkeypatch):
        """A good entry is probed once (marker written); later reads go
        straight to the original — no second fork."""
        import pathlib
        from chatterbox_tpu.utils import jaxcache
        from jax._src import compilation_cache as cc

        (tmp_path / "kg-cache").write_bytes(b"ok")
        calls = tmp_path / "calls"        # cross-process call counter

        class _Cache:
            path = pathlib.Path(tmp_path)

        class _Cpu:
            platform = "cpu"

        def counting_orig(cache_key, co, backend, devs):
            with open(calls, "ab") as f:
                f.write(b"x")
            return ("exe", 7)

        monkeypatch.setattr(jaxcache, "_VERIFIED", False)
        monkeypatch.setattr(cc, "get_executable_and_time", counting_orig)
        monkeypatch.setattr(cc, "_get_cache", lambda backend: _Cache())
        jaxcache.verified_cache_reads(timeout_s=30.0)
        assert cc.get_executable_and_time("kg", None, _Cpu(), None) == \
            ("exe", 7)
        assert (tmp_path / ".verified" / "kg").exists()
        assert calls.read_bytes() == b"xx"     # probe child + parent inline
        assert cc.get_executable_and_time("kg", None, _Cpu(), None) == \
            ("exe", 7)
        assert calls.read_bytes() == b"xxx"    # marker path: inline only

    def test_forked_write_success_lands(self, tmp_path, monkeypatch):
        """The child's successful write is visible to the parent."""
        from chatterbox_tpu.utils import jaxcache
        from jax._src import compilation_cache as cc
        marker = os.path.join(str(tmp_path), "landed")

        class _Cpu:
            platform = "cpu"

        def writing_orig(cache_key, module_name, executable, backend, t):
            with open(marker, "w") as f:
                f.write(cache_key)

        monkeypatch.setattr(jaxcache, "_FORKED", False)
        monkeypatch.setattr(cc, "put_executable_and_time", writing_orig)
        jaxcache.forked_cache_writes(timeout_s=30.0)
        cc.put_executable_and_time("k9", "mod", object(), _Cpu(), 1)
        assert open(marker).read() == "k9"
