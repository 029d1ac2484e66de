"""Profiling and step-rate instrumentation.

The reference has no tracing at all (SURVEY §5: a tqdm bar and prints);
this is new TPU-native surface: ``jax.profiler`` traces viewable in
XProf/TensorBoard plus a lightweight step-rate reporter.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step rate with warm-up exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self._times = []
        self._t0 = None
        self._count = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self._times.append(dt)

    @property
    def mean_seconds(self) -> float:
        return sum(self._times) / max(len(self._times), 1)

    def summary(self, unit: str = "step") -> str:
        m = self.mean_seconds
        rate = 1.0 / m if m else float("inf")
        return f"{m*1000:.1f} ms/{unit} ({rate:.2f} {unit}s/s)"
