"""Observability: per-step throughput meters and jax profiler hooks.

The reference has no tracing/profiling at all (SURVEY §5.1 — a tqdm bar is
its only progress signal); throughput (triples/sec) is this project's
north-star metric, so it is measured and logged first-class.
"""

from __future__ import annotations

import contextlib
import time


class StepTimer:
    """Wall-clock throughput meter with warmup-discarding averages."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def rate(self, units_per_step: float) -> float:
        steady = self.times[self.warmup:] or self.times
        return units_per_step * len(steady) / sum(steady)

    @property
    def mean_ms(self) -> float:
        steady = self.times[self.warmup:] or self.times
        return 1000.0 * sum(steady) / len(steady)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax profiler trace (view with TensorBoard / xprof); no-op if log_dir
    is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
