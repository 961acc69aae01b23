"""Profiling / observability helpers.

Replaces the reference's CUDA-event timing + TensorBoard ``iter_time``
logging (train.py:45-46,189; SURVEY.md §5) with TPU-appropriate tools:

- ``StepTimer``: EMA step timing with Mpix/s and iters/s counters. On the
  tunneled axon runtime, execution is lazy — call ``timer.sync(array)`` with
  a real output each step to get honest wall times.
- ``trace``: context manager around jax.profiler for TensorBoard traces.
- ``enable_persistent_compile_cache``: on-disk XLA compile cache; the
  tunneled remote compiler takes minutes per large graph, so pipeline
  re-runs (e.g. the accuracy report, capacity-growth re-jits across runs)
  would otherwise pay full recompiles every time.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional

import numpy as np


def enable_persistent_compile_cache(
        path: str = "~/.cache/gs_localization_tpu_xla") -> None:
    """Idempotent; safe to call before or after backend initialization."""
    import jax

    try:
        d = os.path.expanduser(path)
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these knobs: cache is an optimization only


class StepTimer:
    def __init__(self, ema: float = 0.6, pixels_per_step: Optional[int] = None):
        self._ema_coef = ema
        self._pixels = pixels_per_step
        self._last = None
        self.ema_ms: Optional[float] = None
        self.steps = 0

    def sync(self, array=None) -> None:
        """Mark a step boundary; pass a device array to force execution."""
        if array is not None:
            np.asarray(jax.tree_util.tree_leaves(array)[0]).ravel()[:1]
        now = time.perf_counter()
        if self._last is not None:
            dt = (now - self._last) * 1e3
            self.ema_ms = dt if self.ema_ms is None else (
                self._ema_coef * dt + (1 - self._ema_coef) * self.ema_ms)
            self.steps += 1
        self._last = now

    @property
    def iters_per_s(self) -> Optional[float]:
        return None if not self.ema_ms else 1000.0 / self.ema_ms

    @property
    def mpix_per_s(self) -> Optional[float]:
        if not self.ema_ms or not self._pixels:
            return None
        return self._pixels / (self.ema_ms / 1e3) / 1e6

    def summary(self) -> str:
        parts = [f"{self.ema_ms:.1f} ms/it"] if self.ema_ms else []
        if self.iters_per_s:
            parts.append(f"{self.iters_per_s:.1f} it/s")
        if self.mpix_per_s:
            parts.append(f"{self.mpix_per_s:.1f} Mpix/s")
        return " | ".join(parts) if parts else "n/a"


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


import jax  # noqa: E402
