"""Profiling and step-timing hooks.

The reference's only timing is a wall-clock ETA after epoch 0
(ref train.py:272-273,338-339); here profiling is a first-class utility:
``jax.profiler`` traces around any code region (viewable in TensorBoard /
Perfetto) and a steps/sec tracker the training loops feed into their logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "./profiles", enabled: bool = True) -> Iterator[None]:
    """Capture a device trace of the enclosed region (XLA ops, HBM transfers)."""
    if not enabled:
        yield
        return
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as exc:  # some PJRT runtimes don't support tracing
        print(f"[profiling] trace unavailable ({exc})")
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            print(f"[profiling] trace written to {log_dir}")


class StepTimer:
    """Rolling steps/sec with compile-time exclusion: the first window after
    construction (which contains jit compilation) is reported separately."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()
        self._steps0 = 0
        self.first_window = True

    def rate(self, step: int) -> float:
        now = time.perf_counter()
        rate = (step - self._steps0) / max(now - self._t0, 1e-9)
        self._t0, self._steps0 = now, step
        self.first_window = False
        return rate


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
