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


class HostLoopProfiler:
    """Per-step host-loop phase decomposition for the training CLIs.

    The device step rate (bench.py) and the CLI wall rate historically
    differ ~2x; this names where the host loop spends its time.  Usage:

        prof = HostLoopProfiler()
        for batch in prof.wrap(loader):       # 'loader_wait' = q.get time
            with prof.phase("h2d"): ...
            with prof.phase("step_dispatch"): ...
        prof.report(logger)

    All times are wall (perf_counter).  Because jax dispatch is async,
    'step_dispatch' measures trace/submit cost, not device compute; the
    device time surfaces as 'loss_fetch' (the one-step-late scalar fetch
    blocks until the PREVIOUS step finishes) plus whichever phase first
    needs a device result.  The first step of each wrap() is skipped
    (compile).
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self._acc: dict = {}
        self._skip = True

    @contextlib.contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if not self._skip:
                e = self._acc.setdefault(name, [0, 0.0])
                e[0] += 1
                e[1] += time.perf_counter() - t0

    def wrap(self, iterable):
        if not self.enabled:
            yield from iterable
            return
        it = iter(iterable)
        self._skip = True  # first batch includes compile; exclude it
        while True:
            with self.phase("loader_wait"):
                try:
                    batch = next(it)
                except StopIteration:
                    return
            yield batch
            self._skip = False

    def report(self, log=None) -> str:
        if not self.enabled or not self._acc:
            return ""
        total = sum(s for _, s in self._acc.values())
        lines = ["host-loop phase decomposition (per profiled step):"]
        n_steps = max((n for n, _ in self._acc.values()), default=0)
        for name, (n, s) in sorted(self._acc.items(),
                                   key=lambda kv: -kv[1][1]):
            lines.append(
                f"  {name:<16} {s / max(n, 1) * 1e3:8.2f} ms/step  "
                f"({100 * s / total:5.1f}% of accounted, n={n})")
        lines.append(f"  accounted wall: {total:.2f} s over ~{n_steps} "
                     "steps (unaccounted gaps = python overhead)")
        text = "\n".join(lines)
        if log is not None:
            log.info("%s", text)
        return text


class ThrottledLossDrain:
    """Collects per-step device loss scalars, blocking only every
    ``fetch_every`` appends.

    ``float(loss)`` through the axon relay is a full host<->device round
    trip; doing it once per step (even one step late) serializes the host
    loop on the device and measured ~90% of the CLI host time at the
    production point (--profile_input, docs/PERFORMANCE.md).  Instead each
    scalar's D2H copy is issued async at dispatch time, and every
    ``fetch_every`` appends we block on the value from ``fetch_every``
    steps back — backpressure that bounds in-flight input batches to
    ~2*fetch_every (the first block lands at append 2K, and between
    boundaries the confirmed watermark lags up to 2K steps) without
    idling the device between fetches.  ``drain()`` blocks on the
    rest (async copies already in flight, so the final device_get
    pipelines) and returns every value in step order.
    """

    def __init__(self, fetch_every: int = 8):
        self.fetch_every = max(1, int(fetch_every))
        self._dev: list = []

    def append(self, loss) -> None:
        """Record one step's loss scalar; blocks only on throttle steps."""
        copy_async = getattr(loss, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()
        self._dev.append(loss)
        k = self.fetch_every
        if len(self._dev) > k and len(self._dev) % k == 0:
            # block on the loss from k steps back: the device has then
            # finished that step, so at most ~2k batches are in flight
            # (first block at append 2k; watermark lag peaks at 2k-1)
            float(self._dev[len(self._dev) - 1 - k])

    def drain(self) -> list:
        """Fetch all recorded losses (in order) and reset."""
        import jax

        vals = [float(v) for v in jax.device_get(self._dev)]
        self._dev = []
        return vals


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
