"""Stage tracing + metrics (the reference has none — SURVEY.md §5 requires
per-stage timing and jax.profiler integration in the TPU build).

Usage:
    from chatterbox_tpu.utils.profiling import stage, metrics
    with stage("t3_decode"):
        ...
    print(metrics.report())

`trace(path)` wraps a block in a jax.profiler trace for xprof/tensorboard.

NOTE on this image's axon relay: device execution is deferred until a value
fetch, so stage timings are only meaningful around host-visible results
(np.asarray / float()).
"""
from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from dataclasses import dataclass

import jax


@dataclass
class _StageStats:
    count: int = 0
    total_s: float = 0.0
    min_s: float = float("inf")
    max_s: float = 0.0

    def add(self, dt: float):
        self.count += 1
        self.total_s += dt
        self.min_s = min(self.min_s, dt)
        self.max_s = max(self.max_s, dt)


class Metrics:
    """Stage timings + counters. Thread-safe: serving handlers record from
    concurrent threads while /metrics scrapes iterate (an unlocked '+=' is a
    read-modify-write race, and iterating a dict that a first-time stage
    insertion mutates raises RuntimeError)."""

    def __init__(self):
        self._stages: dict[str, _StageStats] = defaultdict(_StageStats)
        self._counters: dict[str, float] = defaultdict(float)
        self._lock = threading.Lock()

    def add_stage(self, name: str, dt: float):
        with self._lock:
            self._stages[name].add(dt)

    def count(self, name: str, v: float = 1.0):
        with self._lock:
            self._counters[name] += v

    def report(self) -> dict:
        out = {}
        with self._lock:
            for name, s in sorted(self._stages.items()):
                out[name] = {"count": s.count, "total_s": round(s.total_s, 4),
                             "mean_s": round(s.total_s / max(s.count, 1), 4),
                             "min_s": round(s.min_s, 4),
                             "max_s": round(s.max_s, 4)}
            for name, v in sorted(self._counters.items()):
                out[name] = v
        return out

    def reset(self):
        with self._lock:
            self._stages.clear()
            self._counters.clear()

    def xrt(self, audio_seconds: float, *stage_names: str) -> float:
        """Realtime factor over the given stages' total time."""
        with self._lock:
            t = sum(self._stages[n].total_s
                    for n in stage_names if n in self._stages)
        return audio_seconds / t if t > 0 else float("inf")


metrics = Metrics()


@contextlib.contextmanager
def stage(name: str, m: Metrics = metrics):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        m.add_stage(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view in tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
