"""Profiling spans + logging + progress reporting.

Replaces the reference's sampling profiler (`src/libcore/profiler.cpp`:
ITIMER_PROF + phase bitmask with radar phases Receive /
SampleTransmitterDirection / SignalBlockPut), `Logger` (`logger.cpp`) and
`ProgressReporter` (`progress.cpp`) with the idiomatic JAX equivalents:
named wall-clock spans (device-synchronized), optional jax.profiler traces,
and a simple progress bar.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from collections import defaultdict

import jax

log = logging.getLogger("beifong_tpu")
if not log.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter(
        "%(asctime)s %(levelname).1s [%(name)s] %(message)s", "%H:%M:%S"))
    log.addHandler(_h)
    log.setLevel(logging.INFO)


class Profiler:
    """Accumulating named spans (analogue of ProfilerPhase totals).

    Spans synchronize the device on exit so the numbers reflect real compute
    time, not dispatch time.  Use `profiler.report()` for the phase table the
    reference prints at exit.
    """

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["phase                          total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=lambda k: -self.totals[k]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<30} {t:8.3f} {c:7d} {t / c * 1e3:9.2f}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


profiler = Profiler()


@contextlib.contextmanager
def trace(dirname: str):
    """Capture a jax.profiler device trace (open with TensorBoard/Perfetto)."""
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProgressReporter:
    """Terminal progress bar (reference `src/libcore/progress.cpp`)."""

    def __init__(self, label: str, total: int, width: int = 40,
                 stream=sys.stderr):
        self.label, self.total, self.width = label, max(total, 1), width
        self.stream = stream
        self.t0 = time.time()
        self.n = 0

    def update(self, n: int | None = None):
        self.n = self.n + 1 if n is None else n
        frac = min(self.n / self.total, 1.0)
        filled = int(frac * self.width)
        bar = "=" * filled + ">" + " " * (self.width - filled)
        el = time.time() - self.t0
        eta = el / max(frac, 1e-9) * (1 - frac)
        self.stream.write(f"\r{self.label} [{bar}] {frac * 100:5.1f}% "
                          f"({el:.1f}s, ETA {eta:.1f}s)")
        if frac >= 1.0:
            self.stream.write("\n")
        self.stream.flush()
