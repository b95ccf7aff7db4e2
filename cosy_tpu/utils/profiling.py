"""Profiling / tracing hooks.

The reference has no profiler integration (SURVEY.md §5 — RTF logging only).
Here tracing is first-class: jax.profiler traces around training steps and a
named-scope helper for annotating pipeline stages; traces open in
TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/cosy_tpu_trace") -> Iterator[None]:
    """Capture an XLA profiler trace for the enclosed block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {log_dir} (open with TensorBoard or Perfetto)")


def annotate(name: str):
    """Named trace scope for pipeline stages (shows up in the trace timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time statistics — the per-step timing metric called for by
    the BASELINE north star."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        if len(self.times) > self.window:
            self.times.pop(0)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(1, len(self.times))
