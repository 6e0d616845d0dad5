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


def top_device_ops(trace_dir: str, k: int = 20, group: bool = False):
    """Aggregate DEVICE-track op durations from a jax.profiler perfetto
    trace (``jax.profiler.trace(dir, create_perfetto_trace=True)`` or
    StepProfiler's output dir after conversion).

    Returns [(op_name, total_us, count)] sorted by total duration — the
    round-4 tool that caught jnp.searchsorted's while-loop lowering
    costing the mesh path 2x (docs/PERF.md "Round-4 on-chip results").
    ``group=True`` merges ops by their class (name before the first
    '.'), e.g. all ``while.NNN`` into one row.
    """
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(
        f"{trace_dir}/**/*.trace.json.gz", recursive=True
    ))
    if not paths:
        raise FileNotFoundError(
            f"no *.trace.json.gz under {trace_dir!r} — pass "
            "create_perfetto_trace=True to jax.profiler.trace"
        )
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", data if isinstance(data, list) else [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        p for p, n in pid_names.items()
        if "TPU" in n or "Device" in n or "/device" in n.lower()
    }
    agg: dict = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e.get("name", "?")
            if group:
                name = name.split(".")[0]
            dur, cnt = agg.get(name, (0.0, 0))
            agg[name] = (dur + float(e.get("dur", 0.0)), cnt + 1)
    rows = [(n, d, c) for n, (d, c) in agg.items()]
    rows.sort(key=lambda r: -r[1])
    return rows[:k]
