"""Lightweight throughput/step-time instrumentation and jax.profiler hooks.

The reference has no profiling at all (SURVEY §5.1); the north-star metric
(anomaly-maps/sec/chip) needs first-class counters.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class StepTimer:
    """Tracks items/sec across ticks, excluding the first (compile) step."""

    def __init__(self):
        self._count = 0
        self._items = 0
        self._start: Optional[float] = None
        self._last_tick: Optional[float] = None

    def tick(self, n_items: int = 1) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._count == 1:
            self._start = now  # discard time before/including first step
        else:
            self._items += n_items
        self._last_tick = now

    def stop(self) -> None:
        """Close the measurement window now (e.g. after draining async
        work): with one-step-late loss fetches, ticks happen at dispatch
        time, so the window must extend to the final synchronization for
        the rate to reflect wall time."""
        if self._count:
            self._last_tick = time.perf_counter()

    def rate(self) -> float:
        if self._count < 2 or self._start is None:
            return 0.0
        elapsed = self._last_tick - self._start
        return self._items / elapsed if elapsed > 0 else 0.0


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace scope; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
