"""Profiling and step-timing instrumentation.

The reference's only timing is a one-shot perf_counter in the export script
and tqdm bars (SURVEY.md §5 tracing row). Here:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable device trace of everything inside it.
- ``StepTimer``: rolling-window wall-clock meter reporting steps/sec,
  patches/sec and output MPix/sec — the tracked metrics from BASELINE.json.
- ``annotate``: named TraceAnnotation for labelling pipeline stages.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device/host profile into ``logdir`` (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region in the profiler timeline."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling throughput meter for the training/inference loop."""

    def __init__(self, window: int = 50):
        self._times: deque = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    def patches_per_sec(self, batch_size: int) -> float:
        return self.steps_per_sec * batch_size

    def mpix_per_sec(self, batch_size: int, height: int, width: int) -> float:
        return self.steps_per_sec * batch_size * height * width / 1e6
