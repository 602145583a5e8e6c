"""Profiling / tracing helpers (SURVEY §5: the reference has only ad-hoc
wall-clock prints; this provides stage timers plus jax.profiler traces).
"""

from __future__ import annotations

import contextlib
import time
import typing as tp

import jax


class StageTimer:
    """Wall-clock stage timer that blocks on device work.

    >>> timer = StageTimer()
    >>> with timer.stage("encode"):
    ...     out = encode(...)
    >>> timer.report()
    """

    def __init__(self):
        self.times: tp.Dict[str, float] = {}
        self.counts: tp.Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> tp.Dict[str, float]:
        return {k: self.times[k] / self.counts[k] for k in self.times}


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace context — view with TensorBoard's profile plugin
    or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside traced computations (shows up in xprof)."""
    return jax.profiler.TraceAnnotation(name)
