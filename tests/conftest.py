"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX substitute for multi-chip testing without hardware
(SURVEY.md §4): sharding/pjit paths compile and execute against 8 virtual
CPU devices; numerics tests just use device 0.

NOTE: this image's sitecustomize force-registers the axon TPU backend and
sets JAX_PLATFORMS=axon, so a plain env setdefault is not enough — we
override the jax config directly before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the suite is dominated by repeated XLA CPU
# compiles of tiny models; cache them across tests AND across runs.
#
# The cache dir is scoped per host-CPU fingerprint and writes are made
# atomic: this checkout is mounted by HETEROGENEOUS machines (builder /
# bench driver / reviewer), XLA:CPU executables bake in the compiling
# host's ISA, and jax's cache key ignores it — a foreign-ISA entry is at
# best slow and at worst SIGSEGVs deserialize_executable (observed r5);
# a killed run's half-written entry poisons every later one (bare
# write_bytes upstream). See chatterbox_tpu/utils/jaxcache.py.
from chatterbox_tpu.utils.jaxcache import (atomic_cache_writes,  # noqa: E402
                                           cpu_scoped_dir,
                                           forked_cache_writes,
                                           verified_cache_reads)
_CACHE_DIR = cpu_scoped_dir(os.path.join(os.path.dirname(__file__),
                                         ".jax_cache"))
atomic_cache_writes()
# XLA:CPU executable.serialize SIGSEGVs ~1-in-few-hundred writes (killed two
# full-suite runs this round); a forked writer makes a crash skip the entry
forked_cache_writes()
# ... and the same race can SUCCEED into a well-formed garbage entry that
# aborts deserialize on READ (killed a third run); entries are probed once
# in a forked child and marked verified
verified_cache_reads()
if os.environ.get("CHATTERBOX_TEST_NO_CACHE") != "1":   # leak/A-B debugging
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

assert jax.devices()[0].platform == "cpu", jax.devices()

import pytest  # noqa: E402

# Each XLA:CPU executable maps its JIT code as an anon r-x/r--/rw- triplet;
# a heavy module (test_decode & co) adds ~300 triplets ≈ 900 VMAs per test
# and nothing releases them while the executable is cached. A full suite
# extrapolates to ~56k maps — brushing the kernel's vm.max_map_count
# (65530 here), where the next mmap fails and the process dies (observed as
# an unexplained full-suite crash this round; /proc/self/maps snapshots at
# 41 % of the suite showed ~23k anon triplets). jax.clear_caches() measurably
# releases them (910 → 15 above baseline in the repro), so bound the count:
# clear when past a threshold with ample headroom. The persistent on-disk
# cache makes the forced recompiles cheap (deserialize, not re-codegen).
_MAP_COUNT_CLEAR_THRESHOLD = int(
    os.environ.get("CHATTERBOX_TEST_MAP_THRESHOLD", "30000"))


def _n_vmas() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:  # non-linux: no limit we know how to watch
        return 0


@pytest.fixture(autouse=True)
def _bound_jit_code_maps():
    yield
    if _n_vmas() > _MAP_COUNT_CLEAR_THRESHOLD:
        import gc
        jax.clear_caches()
        gc.collect()


@pytest.fixture(autouse=True)
def _drain_chatterbox_threads():
    """Full-suite segfault guard: a serving-loop thread stuck in a long
    XLA:CPU compile can outlive stop()'s bounded join, keep compiling in
    the background, and race a later test's executable.serialize() inside
    the persistent-cache write (observed as a flaky SIGSEGV in
    jax compilation_cache put_executable_and_time). stop() registers any
    thread whose join timed out (serve/batching.py LINGERING_THREADS);
    wait those out before the next test starts compiling. Threads alive by
    design (module-scoped servers, not yet stopped) are left alone."""
    yield
    from chatterbox_tpu.serve.batching import LINGERING_THREADS
    while LINGERING_THREADS:
        t = LINGERING_THREADS.pop()
        if t.is_alive():
            t.join(timeout=300)
            if t.is_alive():
                # do NOT silently drop a still-alive thread — that would
                # disarm the segfault guard for every later test. Re-register
                # and fail loudly so the race can't recur unnoticed.
                LINGERING_THREADS.append(t)
                pytest.fail(f"serving thread {t.name} still alive after a "
                            f"300 s drain — segfault guard cannot proceed")
