"""Profiling hooks (jax.profiler) — first-class, unlike the reference whose
only instrumentation was wall-clock epoch timing (SURVEY.md §5)."""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Wall-clock timer that forces a device sync via a host fetch (plain
    block_until_ready is unreliable under remote-dispatch runtimes; see
    bench.py)."""

    def __init__(self):
        self.t0: Optional[float] = None

    def start(self) -> None:
        self.t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            jax.device_get(sync_value)
        assert self.t0 is not None
        return time.perf_counter() - self.t0
