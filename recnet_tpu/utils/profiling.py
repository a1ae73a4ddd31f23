"""Profiling hooks — an aux subsystem the reference lacks entirely
(SURVEY §5: 'Tracing / profiling: none').

``trace_steps`` wraps a window of training iterations in a jax.profiler
trace (viewable in TensorBoard / Perfetto); ``StepTimer`` produces steps/sec
and tokens/sec counters without forcing device syncs outside the window.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator


@contextlib.contextmanager
def trace_if(enabled: bool, log_dir: str) -> Iterator[None]:
    """jax.profiler.trace when enabled, no-op otherwise."""
    if not enabled:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield


class StepTimer:
    """Rolling steps/sec + items/sec over a logging window."""

    def __init__(self):
        self._t0 = time.perf_counter()
        self._steps = 0
        self._items = 0

    def tick(self, items: int = 0) -> None:
        self._steps += 1
        self._items += items

    def rates(self) -> tuple[float, float]:
        dt = max(time.perf_counter() - self._t0, 1e-9)
        return self._steps / dt, self._items / dt

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._steps = 0
        self._items = 0
