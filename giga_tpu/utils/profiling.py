"""Structured timing + device profiling as a first-class module.

The reference only has ad-hoc time.time() wall-clocks scattered through the
planner/benchmark (SURVEY.md section 5). Here:
  * ``Timer`` — named wall-clock sections with summary statistics.
  * ``stage`` — context manager recording into a shared Timer.
  * ``device_trace`` — wraps jax.profiler for XLA-level traces viewable in
    TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Iterator


class Timer:
    """Accumulates named wall-clock sections."""

    def __init__(self):
        self.records = defaultdict(list)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def summary(self) -> dict:
        out = {}
        for name, times in self.records.items():
            arr = sorted(times)
            n = len(arr)
            out[name] = {
                "count": n,
                "total": sum(arr),
                "mean": sum(arr) / n,
                "median": arr[n // 2],
                "min": arr[0],
                "max": arr[-1],
            }
        return out

    def report(self) -> str:
        lines = [f"{'section':<32}{'count':>7}{'mean ms':>10}{'median ms':>11}{'total s':>9}"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<32}{s['count']:>7}{s['mean'] * 1e3:>10.3f}"
                f"{s['median'] * 1e3:>11.3f}{s['total']:>9.2f}"
            )
        return "\n".join(lines)

    def reset(self):
        self.records.clear()


GLOBAL_TIMER = Timer()


def stage(name: str):
    """Record a section into the process-wide timer."""
    return GLOBAL_TIMER.section(name)


@contextlib.contextmanager
def device_trace(logdir: str, host_tracer_level: int = 2) -> Iterator[None]:
    """XLA device trace via jax.profiler (open in TensorBoard's profile tab)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """TraceAnnotation for host code visible inside device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
