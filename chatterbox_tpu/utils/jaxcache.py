"""Hardening for jax's persistent compile cache in this repo's workflows.

Two failure modes were hit on the shared-filesystem fleet this repo runs on
(builder / bench driver / test runner are DIFFERENT machines mounting the
same checkout):

1. XLA:CPU executables are compiled for the compiling host's ISA and the
   cache key does NOT include it. A cache entry written by an avx2-only
   host deserializes on an avx512/amx host (and vice versa) — best case it
   silently runs the weaker-ISA code (measured: the r4 bench record's 26 %
   nano-CPU regression came with XLA's "could lead to execution errors
   such as SIGILL" feature-mismatch warning), worst case it SIGSEGVs the
   process (the r5 full-suite crash in deserialize_executable).
   → `cpu_scoped_dir` keys the cache directory by a fingerprint of the
   host's CPU flags, so each machine reads only its own CPU executables.

2. `LRUCache.put` writes entries with a bare `write_bytes` — a kill
   mid-write (the bench driver's timeout, a CI abort) leaves a truncated
   file that poisons every later run.
   → `atomic_cache_writes` patches the write to tmp-file + rename (same
   directory, so the rename is atomic on POSIX).

3. XLA:CPU's `executable.serialize()` SIGSEGVs flakily (observed twice,
   ~1-in-few-hundred writes: full-suite crashes at test_speculative and
   test_continuous, both with the fault inside
   `compilation_cache.put_executable_and_time` on an otherwise idle main
   thread). The executable it serializes RUNS fine — only the write path
   crashes.
   → `forked_cache_writes` runs each CPU-backend cache write in a forked
   child: a native crash there skips that entry instead of killing the
   process. TPU-backend writes stay inline (the TPU relay's socket state
   is not fork-safe).

4. The same serialize race can also SUCCEED while producing a well-formed
   but semantically-garbage buffer: the entry lands atomically, looks
   valid, and ABORTS `backend.deserialize_executable` in every process
   that later READS it (observed: a full-suite "Fatal Python error:
   Aborted" inside `get_executable_and_time` on an entry this repo's own
   hardened writer produced). No write-side check can fully close this —
   only a read that survives the crash can.
   → `verified_cache_reads` probes each CPU-backend entry ONCE in a forked
   child (deserialize in the child; a native crash there deletes the
   entry and reports a miss). A `.verified/<key>` marker makes every
   subsequent read of that entry go straight through inline, so a warm
   cache pays zero forks.

All are no-ops to call more than once.
"""
from __future__ import annotations

import hashlib
import os
import time
import warnings


def cpu_fingerprint() -> str:
    """Short stable fingerprint of this host's CPU (flags + model identity).

    Flags alone are NOT enough: LLVM derives per-SKU tuning preferences
    (e.g. +prefer-no-gather/+prefer-no-scatter) from CPUID family/model,
    so two hosts with identical feature flags but different models produce
    mutually-foreign AOT code — XLA's cpu_aot_loader warns "could lead to
    execution errors such as SIGILL" and the loaded code runs with the
    wrong tuning (measured: the r4/r5 nano-CPU records regressed 26 % on
    exactly such entries). Family/model/stepping + the flag set separate
    the hosts this checkout has actually been mounted on.
    """
    ident, feats = [], ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("vendor_id", "cpu family", "model", "stepping",
                           "model name") and len(ident) < 5:
                    ident.append(line.split(":", 1)[1].strip())
                elif key in ("flags", "Features") and not feats:
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                if feats and len(ident) == 5:
                    break
    except OSError:
        return "unknown"
    blob = "|".join(ident) + "||" + feats
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


def cpu_scoped_dir(base: str) -> str:
    """`base/cpu-<fingerprint>` — a per-ISA subdirectory for CPU-backend
    compile caches shared across heterogeneous machines."""
    d = os.path.join(base, f"cpu-{cpu_fingerprint()}")
    os.makedirs(d, exist_ok=True)
    return d


_PATCHED = False


def atomic_cache_writes() -> None:
    """Make jax's LRUCache.put crash-safe: write to a tmp file in the cache
    directory, fsync, rename. A killed process can no longer leave a
    truncated entry behind."""
    global _PATCHED
    if _PATCHED:
        return
    try:
        from jax._src import lru_cache as lc
    except ImportError:          # cache layout moved; fail open
        return
    orig_put = lc.LRUCache.put

    def put(self, key: str, val: bytes) -> None:
        if not key:
            raise ValueError("key cannot be empty")
        if self.eviction_enabled:
            # size-capped caches keep upstream's lock/eviction bookkeeping
            # (none of this repo's workflows cap the cache)
            return orig_put(self, key, val)
        cache_path = self.path / f"{key}{lc._CACHE_SUFFIX}"
        if cache_path.exists():
            return
        tmp = self.path / f".{key}.{os.getpid()}.tmp"
        try:
            with open(tmp, "wb") as f:
                f.write(val)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cache_path)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass

    put.__doc__ = orig_put.__doc__
    lc.LRUCache.put = put
    _PATCHED = True


_FORKED = False


def forked_cache_writes(timeout_s: float = 120.0) -> None:
    """Isolate CPU-backend persistent-cache writes in a forked child.

    `executable.serialize()` on XLA:CPU crashes flakily (see module
    docstring #3); the serialized entry is only an optimization, so a
    write that dies must never take the process with it. The child gets a
    copy-on-write snapshot of the executable, serializes, writes the cache
    file (atomic via `atomic_cache_writes`), and `os._exit`s; the parent
    reaps it with a timeout and moves on either way. Non-CPU backends
    (the TPU relay's socket is not fork-safe) and non-POSIX hosts call
    the original inline.
    """
    global _FORKED
    if _FORKED or not hasattr(os, "fork"):
        return
    try:
        from jax._src import compilation_cache as cc
    except ImportError:          # layout moved; fail open
        return
    orig = cc.put_executable_and_time

    def put_executable_and_time(cache_key, module_name, executable, backend,
                                compile_time):
        if getattr(backend, "platform", None) != "cpu":
            return orig(cache_key, module_name, executable, backend,
                        compile_time)
        with warnings.catch_warnings():
            # the fork-in-multithreaded-process hazard the warning flags is
            # exactly what the timeout+kill below bounds: a deadlocked child
            # is killed and its entry skipped
            warnings.simplefilter("ignore", RuntimeWarning)
            warnings.simplefilter("ignore", DeprecationWarning)
            pid = os.fork()
        if pid == 0:                      # child: write and vanish
            try:
                import faulthandler
                faulthandler.disable()    # a child crash is handled; no dump
                orig(cache_key, module_name, executable, backend,
                     compile_time)
                os._exit(0)
            except BaseException:
                os._exit(1)
        deadline = time.monotonic() + timeout_s
        while True:
            done, status = os.waitpid(pid, os.WNOHANG)
            if done:
                break
            if time.monotonic() > deadline:
                os.kill(pid, 9)
                os.waitpid(pid, 0)
                status = -1
                break
            time.sleep(0.005)
        if status != 0:
            warnings.warn(
                f"persistent-cache write for {module_name!r} failed in the "
                f"forked writer (status {status}); entry skipped")

    cc.put_executable_and_time = put_executable_and_time
    _FORKED = True


_VERIFIED = False


def verified_cache_reads(timeout_s: float = 120.0) -> None:
    """Make CPU-backend persistent-cache READS crash-proof.

    `backend.deserialize_executable` ABORTS the process on a semantically-
    garbage entry (module docstring #4) — no Python try/except can catch
    it. Each entry is therefore deserialized ONCE in a forked probe child:
    if the child survives, a `.verified/<key>` marker is written and the
    parent (and every later process) reads the entry inline forever after;
    if the child dies on a signal or hangs, the entry file is DELETED, the
    read reports a miss, and the program simply recompiles (the rewrite
    re-probes). Probe cost is one fork + one extra deserialize per entry
    per cache lifetime; a warm, verified cache pays nothing.

    Python-level exceptions inside the probe (decompress errors etc.) exit
    the child cleanly: they reproduce identically inline, where jax's
    `_cache_read` already catches them.
    """
    global _VERIFIED
    if _VERIFIED or not hasattr(os, "fork"):
        return
    try:
        from jax._src import compilation_cache as cc
        from jax._src import lru_cache as lc
    except ImportError:          # layout moved; fail open
        return
    orig = cc.get_executable_and_time

    def get_executable_and_time(cache_key, compile_options, backend,
                                executable_devices):
        if getattr(backend, "platform", None) != "cpu":
            return orig(cache_key, compile_options, backend,
                        executable_devices)
        cache = cc._get_cache(backend)
        path = getattr(cache, "path", None)
        if path is None:         # unknown cache impl; read inline
            return orig(cache_key, compile_options, backend,
                        executable_devices)
        entry = path / f"{cache_key}{lc._CACHE_SUFFIX}"
        if not entry.exists():   # miss: nothing to probe
            return None, None
        marker_dir = path / ".verified"
        marker = marker_dir / cache_key
        if marker.exists():
            return orig(cache_key, compile_options, backend,
                        executable_devices)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            warnings.simplefilter("ignore", DeprecationWarning)
            pid = os.fork()
        if pid == 0:                      # probe child
            try:
                import faulthandler
                faulthandler.disable()    # a child crash is handled; no dump
                orig(cache_key, compile_options, backend, executable_devices)
            except BaseException:
                pass                      # Python errors reproduce inline
            os._exit(0)
        deadline = time.monotonic() + timeout_s
        while True:
            done, status = os.waitpid(pid, os.WNOHANG)
            if done:
                break
            if time.monotonic() > deadline:
                os.kill(pid, 9)
                os.waitpid(pid, 0)
                status = -1
                break
            time.sleep(0.005)
        if status != 0:                   # native crash/hang: poison entry
            try:
                os.unlink(entry)
            except OSError:
                pass
            warnings.warn(
                f"persistent-cache entry {cache_key!r} crashed the forked "
                f"deserialize probe (status {status}); entry deleted, "
                f"treating as a cache miss")
            return None, None
        try:
            marker_dir.mkdir(parents=True, exist_ok=True)
            marker.write_bytes(b"")
        except OSError:
            pass                          # unverifiable ≠ unreadable
        return orig(cache_key, compile_options, backend, executable_devices)

    cc.get_executable_and_time = get_executable_and_time
    _VERIFIED = True
