"""Misc utilities mirroring the reference utils package.

(reference: src/utils/stats.py, src/utils/autoclip_module.py,
src/utils/linalg.py, src/utils/split_dir.py, src/utils/torch_utils.py)
"""
from __future__ import annotations

import bisect
import dataclasses
from pathlib import Path
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def count_parameters(params: Any) -> int:
    """(reference: src/utils/torch_utils.py:4-7)."""
    return sum(int(np.prod(np.asarray(x).shape))
               for x in jax.tree.leaves(params))


class StandardScaler:
    """Streaming Welford mean/variance normalizer
    (reference: src/utils/stats.py:4-89). Host-side numpy state."""

    def __init__(self, dim: int):
        self.count = 0
        self.mean = np.zeros(dim, np.float64)
        self.m2 = np.zeros(dim, np.float64)

    def update(self, x: np.ndarray) -> None:
        x = np.asarray(x, np.float64).reshape(-1, self.mean.shape[0])
        for row in x:
            self.count += 1
            delta = row - self.mean
            self.mean += delta / self.count
            self.m2 += delta * (row - self.mean)

    @property
    def var(self) -> np.ndarray:
        return self.m2 / max(self.count - 1, 1)

    @property
    def std(self) -> np.ndarray:
        return np.sqrt(self.var)

    def transform(self, x: Array) -> Array:
        return (x - jnp.asarray(self.mean, x.dtype)) / jnp.asarray(
            np.maximum(self.std, 1e-8), x.dtype)

    def inverse_transform(self, x: Array) -> Array:
        return x * jnp.asarray(self.std, x.dtype) + jnp.asarray(
            self.mean, x.dtype)


class AutoClipper:
    """Percentile-history gradient clipping
    (reference: src/utils/autoclip_module.py:33-70). The host keeps the
    norm history; call `threshold(gnorm)` with this step's global norm and
    clip with the returned value (e.g. optax.clip_by_global_norm built per
    step, or scale updates by min(1, thr/gnorm))."""

    def __init__(self, p: float):
        self.autoclip_p = p / 100.0
        self.grad_norm_history: List[float] = []

    def threshold(self, gnorm: float) -> float:
        bisect.insort(self.grad_norm_history, float(gnorm))
        index = int(self.autoclip_p * len(self.grad_norm_history))
        if index == len(self.grad_norm_history):
            index -= 1
        return self.grad_norm_history[index]


def clip_update_by_threshold(updates: Any, gnorm: Array,
                             threshold: float) -> Any:
    """Scale a grad/update tree to the given norm threshold."""
    scale = jnp.minimum(1.0, threshold / jnp.maximum(gnorm, 1e-12))
    return jax.tree.map(lambda u: u * scale, updates)


def solve_psd_loaded(a: Array, b: Array, load: float = 1e-5) -> Array:
    """Diagonally-loaded PSD solve (reference: src/utils/linalg.py:20-36)."""
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)
    trace = jnp.trace(a, axis1=-2, axis2=-1)[..., None, None]
    a_loaded = a + load * trace / n * eye
    return jnp.linalg.solve(a_loaded, b)


@dataclasses.dataclass
class SplitDirectory:
    """Rolling output sharding, max N files per subdirectory
    (reference: src/utils/split_dir.py:5-47)."""

    root: str
    max_files: int = 1000

    def __post_init__(self):
        self._count = 0
        self._shard = 0
        Path(self.root).mkdir(parents=True, exist_ok=True)

    def next_path(self, filename: str) -> str:
        if self._count >= self.max_files:
            self._shard += 1
            self._count = 0
        d = Path(self.root) / f"{self._shard:05d}"
        d.mkdir(parents=True, exist_ok=True)
        self._count += 1
        return str(d / filename)
