"""Checkpoint / resume: orbax-backed state persistence with top-k and
best-model symlink semantics.

Re-design of the reference checkpointing stack (reference:
Lightning ModelCheckpoint(save_top_k=20, monitor='val/si_sdr', mode='max')
src/train_diffsep.py:116-124; EMA embedded in checkpoints
src/diffsep.py:578-609; best-model symlink monkey-patch
src/utils/checkpoint_symlink.py:8-43). The EMA params live inside the
TrainState tree, so one save captures everything needed for resume AND for
eval-with-EMA.
"""
from __future__ import annotations

import json
import math
import os
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp
    return ocp


class CheckpointManager:
    """Top-k checkpoint manager keyed by a monitored metric."""

    def __init__(self, directory: str, monitor: str = "val/si_sdr",
                 mode: str = "max", save_top_k: int = 20,
                 write: bool = True):
        # write=False keeps restore() working but turns every write
        # (ckpt dirs, index.json, best-model link) into a no-op --
        # multi-host training passes write=is_rank_zero() so N hosts
        # don't race the shared index/symlink
        self.write = write
        self.dir = Path(directory)
        if write:
            self.dir.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self._index_path = self.dir / "index.json"
        self._index: Dict[str, float] = {}
        if self._index_path.exists():
            self._index = json.loads(self._index_path.read_text())

    def _rank_key(self, metric: float) -> float:
        """Deterministic ordering key: NaN/missing metrics rank WORST
        (sorted() with NaN keys is otherwise non-deterministic -- a NaN
        checkpoint could shadow the true best or survive pruning)."""
        if math.isnan(metric):
            return -math.inf if self.mode == "max" else math.inf
        return metric

    def _ckpt_name(self, step: int, metric: float) -> str:
        key = self.monitor.replace("/", "_")
        return f"step-{step:08d}_{key}-{metric:.3f}"

    def save(self, state: Any, step: int, metrics: Dict[str, float]) -> str:
        """Save `state` (any pytree); prune to top-k; refresh best link."""
        if not self.write:
            return ""
        ocp = _ocp()
        metric = float(metrics.get(self.monitor, float("nan")))
        name = self._ckpt_name(step, metric)
        path = self.dir / name
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), state)
        ckptr.wait_until_finished()
        (path / "metrics.json").write_text(json.dumps(
            {k: float(v) for k, v in metrics.items()}, indent=1))
        self._index[name] = metric
        self._prune()
        self._write_index()
        self._update_best_symlink()
        return str(path)

    def _prune(self):
        if len(self._index) <= self.save_top_k:
            return
        rev = self.mode == "max"
        ranked = sorted(self._index.items(),
                        key=lambda kv: self._rank_key(kv[1]), reverse=rev)
        for name, _ in ranked[self.save_top_k:]:
            p = self.dir / name
            if p.exists():
                shutil.rmtree(p)
            self._index.pop(name, None)

    def _write_index(self):
        self._index_path.write_text(json.dumps(self._index, indent=1))

    def _update_best_symlink(self):
        """best-model symlink (reference: src/utils/checkpoint_symlink.py:
        8-43 symlink_force)."""
        if not self._index:
            return
        rev = self.mode == "max"
        best = sorted(self._index.items(),
                      key=lambda kv: self._rank_key(kv[1]),
                      reverse=rev)[0][0]
        link = self.dir / "best-model"
        tmp = self.dir / ".best-model.tmp"
        if tmp.exists() or tmp.is_symlink():
            tmp.unlink()
        os.symlink(best, tmp)
        os.replace(tmp, link)

    def save_latest(self, state: Any, step: int) -> str:
        """Unconditionally write/overwrite the rolling 'latest' checkpoint
        (crash-resume anchor, independent of the metric-ranked top-k)."""
        if not self.write:
            return ""
        ocp = _ocp()
        tmp = self.dir / ".latest.tmp"
        final = self.dir / "latest"
        if tmp.exists():
            shutil.rmtree(tmp)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(tmp.absolute(), state)
        ckptr.wait_until_finished()
        (tmp / "step.json").write_text(json.dumps({"step": int(step)}))
        # never leave a window with NO 'latest': move the old one aside,
        # atomically swap the new one in, then delete the old
        old = self.dir / ".latest.old"
        if old.exists():
            shutil.rmtree(old)
        if final.exists():
            os.replace(final, old)
        os.replace(tmp, final)
        if old.exists():
            shutil.rmtree(old)
        return str(final)

    def best_path(self) -> Optional[str]:
        link = self.dir / "best-model"
        return str(link.resolve()) if link.exists() else None

    def latest_path(self) -> Optional[str]:
        """The rolling 'latest' checkpoint if present, else the newest
        (highest-step) retained top-k checkpoint."""
        rolling = self.dir / "latest"
        if rolling.exists():
            return str(rolling)
        if not self._index:
            return None
        name = sorted(self._index)[-1]
        return str(self.dir / name)

    def restore(self, template: Any, path: Optional[str] = None,
                prefer: str = "latest") -> Any:
        """Restore into the structure/shardings of `template`.
        prefer='latest' resumes training where it stopped; 'best' loads
        the top-metric checkpoint (evaluation)."""
        ocp = _ocp()
        if path is None:
            if prefer == "latest":
                path = self.latest_path() or self.best_path()
            else:
                path = self.best_path() or self.latest_path()
        if path is None:
            raise FileNotFoundError(f"no checkpoints under {self.dir}")
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(Path(path).absolute(), target=template)


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (the `unwrap_model` equivalent: bare inference
    weights, reference: src/training/unwrap_model.py:7-135)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = {}
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        out[key] = np.asarray(leaf)
    # Atomic: write to a sibling temp file, then rename over the target,
    # so a kill mid-write preserves the previous good checkpoint.
    tmp = f"{path}.tmp-{os.getpid()}"
    np.savez(tmp, **out)
    # np.savez appends .npz when the name lacks it
    tmp_real = tmp if tmp.endswith(".npz") else f"{tmp}.npz"
    os.replace(tmp_real, path if path.endswith(".npz") else f"{path}.npz")


def load_params_npz(path: str, template: Any) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    # tolerate the one-level collection wrapper mismatch: some exporters
    # save the full flax variables dict ({'params': ...} -> 'params/...'
    # keys) while loaders template the bare params tree, and vice versa
    # (e.g. scripts/latent_long_train.py vs cli/evaluate --vae-params)
    keyset = set(data.keys())
    leaves = []
    for kp, leaf in flat:
        key = "/".join(str(getattr(k, "key", k)) for k in kp)
        if key not in keyset:
            if f"params/{key}" in keyset:
                key = f"params/{key}"
            elif key.startswith("params/") and key[7:] in keyset:
                key = key[7:]
        arr = data[key]
        want = np.asarray(leaf).shape
        if arr.shape != want:  # not assert: must survive python -O
            raise ValueError(
                f"checkpoint leaf {key!r} has shape {arr.shape}, model "
                f"expects {want} — wrong architecture/config for this "
                "npz")
        leaves.append(arr.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)
