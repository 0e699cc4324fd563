"""Tracing / profiling hooks (SURVEY.md §5.1).

The reference only prints wall-clock per epoch (MNIST_experiment.py:371-374,
517-518).  Here per-step timing is a first-class metric and jax.profiler
traces can wrap any phase:

    with trace_if("/tmp/trace", enabled=args.profile):
        state, metrics = step_fn(state, batch)

    timer = StepTimer()
    ...
    with timer:
        state, _ = step_fn(state, batch)
    print(timer.summary())
"""

from __future__ import annotations

import contextlib
import time
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace_if(trace_dir: str, enabled: bool = True):
    """jax.profiler trace context, no-op when disabled."""
    if not enabled:
        yield
        return
    with jax.profiler.trace(trace_dir):
        yield


def annotate(name: str):
    """Named trace annotation for a code region (shows up in xprof)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock accumulator with percentile summary.

    `steps_per_block` scales the report when each timed block covers more
    than one optimizer step (e.g. a whole-epoch lax.scan runner — time the
    block that both dispatches AND materializes a metric, since dispatch
    alone returns before the device finishes).
    """

    def __init__(self, steps_per_block: int = 1):
        self.steps_per_block = steps_per_block
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def summary(self) -> str:
        if not self.times:
            return "no steps timed"
        arr = np.asarray(self.times) * 1e3 / self.steps_per_block
        unit = ("step" if self.steps_per_block == 1
                else f"step (blocks of {self.steps_per_block})")
        return (f"{len(self.times) * self.steps_per_block} steps: "
                f"mean {arr.mean():.3f} ms/{unit}, "
                f"p50 {np.percentile(arr, 50):.3f} ms, "
                f"p95 {np.percentile(arr, 95):.3f} ms, "
                f"{1000.0 / arr.mean():.1f} steps/s")

    @property
    def steps_per_sec(self) -> float:
        return (len(self.times) * self.steps_per_block
                / max(sum(self.times), 1e-12))
