"""Timers, throughput counters and jax.profiler hooks.

The reference has no tracing/profiling at all (SURVEY §5: logging scaffold
only, call sites commented out). Here every batch item records wall time and
Mpoints/sec, and a ``trace`` context wraps ``jax.profiler`` for kernel-level
inspection on TPU.
"""
from __future__ import annotations

import contextlib
import time
import typing


class Timer:
    """Accumulating named stage timer.

    >>> t = Timer()
    >>> with t.stage("nn"):
    ...     work()
    >>> t.times["nn"]
    """

    def __init__(self) -> None:
        self.times: typing.Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def total(self) -> float:
        return sum(self.times.values())


def mpoints_per_sec(n_points: int, seconds: float) -> float:
    if seconds <= 0:
        return float("inf")
    return n_points / seconds / 1e6


@contextlib.contextmanager
def trace(log_dir: typing.Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
