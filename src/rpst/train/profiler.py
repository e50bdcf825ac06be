"""Profiling hooks — the observability the reference lacks (SURVEY §5:
wall-clock prints only, train.py:180,192-194).

  * ``trace(logdir)``    — context manager around ``jax.profiler`` for
    on-demand device traces (view in TensorBoard / xprof).
  * ``StepTimer``        — robust step timing that understands async
    dispatch (measures completed-work rate, not dispatch rate).
  * ``annotate``         — named trace spans for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace: ``with trace('out/trace'): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_trace(logdir: str) -> None:
    """Span-style variant of :func:`trace` for captures that straddle
    loop iterations (train.py's ``profile_iter`` window)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()


def annotate(name: str):
    """Named span (shows up in profiler timelines)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state steps/sec with async-aware sampling.

    Call ``tick(result)`` each step; every ``sync_every`` steps it blocks on
    the given result to drain the dispatch queue, so the rate reflects real
    device progress (naïve per-step timing under-reports on async
    runtimes; see bench.py's chained-timing note)."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self._count = 0
        self._t0: Optional[float] = None
        self.steps_per_sec = float("nan")

    def tick(self, result) -> None:
        self._count += 1
        if self._t0 is None:
            jax.block_until_ready(result)
            self._t0 = time.perf_counter()
            self._count = 0
            return
        if self._count % self.sync_every == 0:
            jax.block_until_ready(result)
            now = time.perf_counter()
            self.steps_per_sec = self.sync_every / (now - self._t0)
            self._t0 = now
