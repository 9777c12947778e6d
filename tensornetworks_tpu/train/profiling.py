"""Profiling and debugging hooks.

SURVEY.md §5.1-5.2: the reference has no tracing/profiling and relies on
manual NaN guards; the TPU-native equivalents are ``jax.profiler`` traces and
``jax_debug_nans``.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace into ``log_dir`` (no-op if None).
    View with tensorboard / xprof."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enabled: bool = True) -> Iterator[None]:
    """Raise on the first NaN produced inside — the structured replacement for
    the reference's per-loss NaN checks (``ksd_vi.py:142``)."""
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


class StepTimer:
    """Wall-clock timing helper producing per-step stats for history dicts."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")
