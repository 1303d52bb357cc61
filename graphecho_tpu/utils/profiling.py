"""Tracing / profiling utilities.

The reference ships none (torch-tb-profiler is installed but never imported —
SURVEY §5); this is a capability the TPU build adds:
  * `profile_trace` — context manager around `jax.profiler` writing a
    TensorBoard-loadable trace;
  * `StepTimer` — host-side per-step wall-clock stats with warmup skipping;
  * `annotate` — named TraceAnnotation for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace: `with profile_trace('/tmp/trace'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling per-step timing with compile-warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self.min = float("inf")
        self.max = 0.0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
            self.min = min(self.min, dt)
            self.max = max(self.max, dt)
        return False

    @property
    def mean(self) -> float:
        steady = self.count - self.warmup
        return self.total / steady if steady > 0 else float("nan")

    def stats(self) -> Dict[str, float]:
        return {"steps": self.count, "mean_s": self.mean,
                "min_s": self.min, "max_s": self.max}
