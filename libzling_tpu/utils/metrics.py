"""Structured metrics registry (the debug-counter subsystem analog).

The reference has compile-gated named counters dumped at exit
(src/libzling_debug.h:38-49, src/libzling_debug.cpp:43-58).  Here: a
process-wide registry of named counters/timers, cheap enough to leave on,
plus a helper to wrap codec calls with throughput accounting.  Device-side
profiling uses jax.profiler (see ``trace``).
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict


class Metrics:
    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, int] = defaultdict(int)
        self.timers: dict[str, float] = defaultdict(float)

    def count(self, name: str, n: int = 1) -> None:
        with self._lock:
            self.counters[name] += n

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            with self._lock:
                self.timers[name] += time.perf_counter() - t0

    def snapshot(self) -> dict:
        with self._lock:
            return {"counters": dict(self.counters), "timers": dict(self.timers)}

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.timers.clear()

    def report(self) -> str:
        snap = self.snapshot()
        lines = [f"  {k}: {v}" for k, v in sorted(snap["counters"].items())]
        lines += [f"  {k}: {v:.4f}s" for k, v in sorted(snap["timers"].items())]
        return "\n".join(lines) if lines else "  (empty)"


registry = Metrics()


@contextlib.contextmanager
def trace(name: str, out_dir: str = "/tmp/libzling_tpu_trace"):
    """jax.profiler trace around a region (XLA-level device profiling)."""
    import jax

    with jax.profiler.trace(out_dir):
        with jax.profiler.TraceAnnotation(name):
            yield
