"""Profiling hooks (SURVEY.md §5 "tracing/profiling").

- ``profile_window``: captures a jax.profiler trace (TensorBoard-viewable)
  around a step range, driven by TrainConfig.profile_steps=(start, stop).
- ``annotate``: named TraceAnnotation scopes for the lookup/top-k hot paths.
- ``Timer``: block_until_ready-fenced wall timing for honest examples/s.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


class StepProfiler:
    """Starts/stops a jax.profiler trace when the step counter crosses the
    configured window. Safe to call every step; no-ops outside the window."""

    def __init__(self, window: tuple[int, int] | None, out_dir: str = "/tmp/tfrec_trace"):
        self.window = window
        self.out_dir = out_dir
        self._active = False

    def step(self, step_idx: int) -> None:
        if self.window is None:
            return
        start, stop = self.window
        # >= not ==: callers may advance the counter by steps_per_dispatch,
        # skipping the exact start step.
        if not self._active and start <= step_idx < stop:
            jax.profiler.start_trace(self.out_dir)
            self._active = True
        elif self._active and step_idx >= stop:
            jax.profiler.stop_trace()
            self._active = False

    def close(self) -> None:
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    with jax.profiler.TraceAnnotation(name):
        yield


class Timer:
    """Wall timer fenced by block_until_ready on a result pytree."""

    def __init__(self):
        self.t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        return time.perf_counter() - self.t0
