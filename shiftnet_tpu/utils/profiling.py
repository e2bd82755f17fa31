"""Profiling / tracing helpers (replaces the reference's nothing — SURVEY §5:
the reference only has wall-clock phase timers; here we expose jax.profiler
traces plus simple phase timers)."""
from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a jax.profiler trace (TensorBoard/Perfetto) when ``logdir``
    is set; no-op otherwise.  Usage: ``with trace('/tmp/prof'): step()``."""
    if not logdir:
        yield
        return
    import jax
    with jax.profiler.trace(logdir):
        yield


class PhaseTimer:
    """Accumulating wall-clock phase timer (the reference logs pre/forward/
    post seconds per chunk — ``test_deblur.py:158-164``)."""

    def __init__(self):
        self.totals: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = (self.totals.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def summary(self) -> str:
        return ' '.join(f'{k}:{v:.3f}s' for k, v in self.totals.items())
