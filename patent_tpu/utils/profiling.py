"""Profiling + numerical-guard subsystem.

The reference has no tracing/profiling at all (SURVEY §5: only tqdm bars and
ad-hoc wall timing) and only ad-hoc NaN guards (auxiliary.py:156-158,
train.py:3262-3263).  This module provides the framework-level equivalents:

* ``profile_trace`` — context manager around ``jax.profiler`` writing an
  xprof-compatible trace directory.
* ``StepTimer`` — cheap per-step wall timing with percentile summaries
  (device-async-aware: call ``mark`` after a host sync point).
* ``assert_all_finite`` — checkify-style finite check usable inside jitted
  code (debug mode) or on host pytrees.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str) -> Iterator[None]:
    """``with profile_trace('/tmp/trace'): step(...)`` → xprof trace."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._last: float | None = None
        self._count = 0

    def mark(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    def summary(self) -> dict[str, float]:
        if not self._times:
            return {"steps": 0}
        arr = np.asarray(self._times)
        return {
            "steps": len(arr),
            "mean_ms": float(arr.mean() * 1e3),
            "p50_ms": float(np.percentile(arr, 50) * 1e3),
            "p95_ms": float(np.percentile(arr, 95) * 1e3),
            "steps_per_sec": float(1.0 / arr.mean()),
        }


def assert_all_finite(tree: Any, name: str = "tree") -> None:
    """Host-side finite check over a pytree; raises with the failing path."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.all(np.isfinite(arr)):
            bad = int(np.sum(~np.isfinite(arr)))
            raise FloatingPointError(
                f"{name}{jax.tree_util.keystr(path)}: {bad} non-finite values")


def debug_nan_guard(value: jax.Array, label: str = "value") -> jax.Array:
    """In-jit NaN guard: replaces non-finite entries with 0 and reports via
    jax.debug.print (the framework's version of the reference's silent
    ``if torch.isnan: return 0`` fallbacks, auxiliary.py:156-158)."""
    bad = jnp.logical_not(jnp.isfinite(value))
    n_bad = jnp.sum(bad)
    jax.lax.cond(
        n_bad > 0,
        lambda: jax.debug.print("[patent_tpu] WARNING: {} non-finite in " + label,
                                n_bad),
        lambda: None)
    return jnp.where(bad, 0.0, value)
