"""Profiling / tracing / numerical-debug hooks.

Replaces the reference's minimal instrumentation (reference: the
hand-rolled Profiler ticker src/stable_audio_tools/training/
diffusion.py:28-43, wall-clock eval timing src/evaluate_mp.py:325-327,
detect_anomaly=True src/train_diffsep.py:160) with jax.profiler traces and
explicit finite-checks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)


class Ticker:
    """Wall-clock phase ticker (reference: training/diffusion.py:28-43)."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled
        self.times: Dict[str, float] = {}
        self._last = time.perf_counter()

    def tick(self, name: str) -> None:
        if not self.enabled:
            return
        now = time.perf_counter()
        self.times[name] = self.times.get(name, 0.0) + now - self._last
        self._last = now

    def summary(self) -> Dict[str, float]:
        return dict(self.times)


def enable_nan_debugging() -> None:
    """Global NaN tracer -- the detect_anomaly=True equivalent. Slows
    everything down; escape hatch only."""
    jax.config.update("jax_debug_nans", True)


def check_finite(tree: Any, name: str = "tree") -> None:
    """Raise if any leaf holds non-finite values (host sync)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        a = np.asarray(leaf)
        if not np.all(np.isfinite(a)):
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            raise FloatingPointError(
                f"non-finite values in {name}:{p} "
                f"(nan={np.isnan(a).sum()}, inf={np.isinf(a).sum()})")


def finite_guard(metrics: Dict[str, Any]) -> bool:
    """Cheap per-step guard: True if all scalar metrics are finite."""
    return all(np.isfinite(float(v)) for v in metrics.values())
