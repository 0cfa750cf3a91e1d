"""Tracing/profiling hooks (SURVEY.md §5 aux subsystems).

The reference instruments every protocol stage with chrono timepoint pairs
(test_client.cc:89-216); here the same stage-timer pattern is a reusable
class, plus ``jax.profiler`` trace capture for device-side analysis.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["StageTimer", "device_trace"]


class StageTimer:
    """Named nanosecond stage timers: the d_* metrics pattern."""

    def __init__(self):
        self.ns: dict[str, int] = {}
        self._t0 = time.perf_counter_ns()

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        start = time.perf_counter_ns()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self.ns[name] = self.ns.get(name, 0) + time.perf_counter_ns() - start

    def total_ns(self) -> int:
        return time.perf_counter_ns() - self._t0

    def report(self, out=print):
        for name, ns in self.ns.items():
            out(f"d_{name}\t{ns / 1e6:.3f}ms")
        out(f"d_total\t{self.total_ns() / 1e6:.3f}ms")


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/pplp_trace"):
    """Capture a jax.profiler trace around a code region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
