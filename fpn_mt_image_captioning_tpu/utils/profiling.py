"""Profiling / tracing utilities.

The reference has no profiling story (SURVEY.md §5.1 — only ad-hoc
``time.time()``). This module makes tracing first-class:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    TensorBoard-viewable traces of device execution;
  * ``annotate(name)`` — named trace spans (``jax.profiler.TraceAnnotation``);
  * ``StepTimer`` — host-side rolling step timing with percentile summaries,
    synchronizing via device→host copies (``block_until_ready`` is unreliable
    on tunneled backends — see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np

__all__ = ["trace", "annotate", "StepTimer", "sync"]


def sync(tree: Any) -> None:
    """Force completion of device work by copying one leaf to the host."""
    import jax

    leaves = jax.tree.leaves(tree)
    if leaves:
        np.asarray(leaves[0])


@contextlib.contextmanager
def trace(logdir: str = "logs/profile"):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside an active trace."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock timer for training/serving steps."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result: Any = None) -> float:
        if result is not None:
            sync(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_ms": float(arr.mean() * 1000),
            "p50_ms": float(np.percentile(arr, 50) * 1000),
            "p90_ms": float(np.percentile(arr, 90) * 1000),
            "p99_ms": float(np.percentile(arr, 99) * 1000),
            "steps": len(arr),
        }
