"""Profiling / tracing helpers (SURVEY §5: the reference has only ad-hoc
wall-clock prints; this provides stage timers plus jax.profiler traces).
"""

from __future__ import annotations

import contextlib
import time
import typing as tp

import jax


class _StageHandle:
    """Collects the stage's device outputs so the timer can block on them
    at exit — `block_on` values cannot be passed at entry because they do
    not exist yet."""

    def __init__(self):
        self._watched: list = []

    def watch(self, value):
        """Register a (pytree of) device value(s); returns it unchanged."""
        self._watched.append(value)
        return value


class StageTimer:
    """Wall-clock stage timer that blocks on device work.

    JAX dispatch is asynchronous: timing a block without blocking on its
    outputs measures dispatch latency (microseconds), not device work.
    Register each stage's outputs with `watch`:

    >>> timer = StageTimer()
    >>> with timer.stage("encode") as s:
    ...     out = s.watch(encode(...))
    >>> timer.report()
    """

    def __init__(self):
        self.times: tp.Dict[str, float] = {}
        self.counts: tp.Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        handle = _StageHandle()
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            for v in handle._watched:
                jax.block_until_ready(v)
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
