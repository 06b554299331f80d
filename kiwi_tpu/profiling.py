"""Timing / throughput observability (SURVEY §5 tracing).

The reference has inform() messages, test_begin/test_end cpu_time pairs
(util.f90:170-215) and kiwibench's rolling models-per-second counter
(benchmark/kiwibench.py:135-148).  Here:

* `Timers` -- named accumulating wall-time phases (context manager),
* `MPSCounter` -- the canonical models/sec metric with rolling windows,
* `jax_trace` -- a thin gate around the JAX profiler for kernel-level
  traces (view with TensorBoard / xprof).
"""

from __future__ import annotations

import contextlib
import time


class Timers:
    """Accumulating named wall-time phases."""

    def __init__(self):
        self.acc = {}
        self.counts = {}

    @contextlib.contextmanager
    def __call__(self, name):
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.acc[name] = self.acc.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        total = sum(self.acc.values()) or 1.0
        rows = sorted(self.acc.items(), key=lambda kv: -kv[1])
        return "\n".join(
            f"{k:24s} {v:9.3f} s  {100 * v / total:5.1f}%  ({self.counts[k]}x)"
            for k, v in rows
        )

    def reset(self):
        self.acc.clear()
        self.counts.clear()


class MPSCounter:
    """Rolling models-per-second (kiwibench.py:135-148's MPS triple:
    total average / last-window average / instantaneous)."""

    def __init__(self, window=10):
        self.window = window
        self.t0 = time.time()
        self.events = []  # (t, nmodels)
        self.total = 0

    def add(self, nmodels):
        now = time.time()
        self.events.append((now, nmodels))
        self.total += nmodels
        if len(self.events) > self.window:
            self.events.pop(0)

    def rates(self):
        """(total_avg, window_avg, last) models/sec."""
        now = time.time()
        total_avg = self.total / max(now - self.t0, 1e-9)
        if len(self.events) >= 2:
            span = self.events[-1][0] - self.events[0][0]
            nwin = sum(n for _, n in self.events[1:])
            window_avg = nwin / max(span, 1e-9)
        else:
            window_avg = total_avg
        if len(self.events) >= 2:
            dt = self.events[-1][0] - self.events[-2][0]
            last = self.events[-1][1] / max(dt, 1e-9)
        else:
            last = total_avg
        return total_avg, window_avg, last


@contextlib.contextmanager
def jax_trace(logdir):
    """JAX profiler trace around a block (inspect with xprof/TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
