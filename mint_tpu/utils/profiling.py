"""Profiling & step timing (SURVEY.md §5: absent in the reference; added
as a first-class subsystem since the north-star metric is
frames/sec/chip).

- :class:`StepTimer` — wall-clock step rate with warmup skip, for
  steps/sec and examples/sec reporting in the controller.
- :func:`trace` — context manager around ``jax.profiler`` trace capture;
  view with TensorBoard or xprof.
- :func:`annotate` — named TraceAnnotation for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class StepTimer:
    """Tracks steps/sec over a sliding window, skipping warmup steps."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._timed_steps = 0
        self._elapsed = 0.0
        self._last: Optional[float] = None

    def step(self) -> None:
        now = time.perf_counter()
        self._count += 1
        if self._count > self.warmup_steps and self._last is not None:
            self._elapsed += now - self._last
            self._timed_steps += 1
        self._last = now

    def steps_per_sec(self) -> float:
        if not self._timed_steps or self._elapsed <= 0:
            return 0.0
        return self._timed_steps / self._elapsed

    def metrics(self, batch_size: Optional[int] = None
                ) -> Dict[str, float]:
        out = {"steps_per_sec": self.steps_per_sec()}
        if batch_size:
            out["examples_per_sec"] = out["steps_per_sec"] * batch_size
        return out


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard/xprof-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation that shows up on the host timeline in traces."""
    return jax.profiler.TraceAnnotation(name)
