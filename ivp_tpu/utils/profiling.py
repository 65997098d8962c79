"""Observability helpers (SURVEY.md §5: tracing/profiling).

The solver statistics (nfev/njev/nlu/nstep/naccpt/nrejct) are traced int32
counters in the integration carry — the same counters the reference exposes
(reference src/methods/mod.rs:57-97).  These helpers add wall-clock tracing
around compile/execute via jax.profiler.
"""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace of the enclosed solves.

    View with TensorBoard or Perfetto:  with trace("/tmp/ivp-trace"): ...
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region in the profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


class WallClock:
    """Tiny compile/run wall-clock splitter for benchmarks."""

    def __init__(self):
        self.events = []

    @contextlib.contextmanager
    def measure(self, name: str):
        start = time.perf_counter()
        try:
            yield
        finally:
            self.events.append((name, time.perf_counter() - start))

    def report(self):
        return {name: round(dt, 4) for name, dt in self.events}
