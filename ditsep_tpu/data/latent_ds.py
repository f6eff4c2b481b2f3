"""Cached-latent dataset for decoder finetuning.

Re-design of the reference WSJ0LatentDataset
(reference: src/datasets/latent_ds.py:9-118 and the cache writer
src/ldm.py:296-389): latents sampled offline by the separation pipeline
are stored as npz shards next to a metadata file, then joined with the
original waveform targets at load time.

Format: ``latent_%06d.npz`` with array 'latent' (n_src, D, T_lat), plus
``metadata.npz`` holding the item count and source-dataset indices.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def save_latent_cache(out_dir: str, index: int, latent: np.ndarray,
                      targets: Optional[np.ndarray] = None) -> None:
    """Store one cached latent; pass ``targets`` (n_src, T) to pin the
    EXACT waveform crop the latent was encoded from — random-cropping
    datasets re-draw their crop on every access, so re-reading the base
    dataset later would pair the latent with a different crop."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    arrays = {"latent": np.asarray(latent, np.float32)}
    if targets is not None:
        arrays["targets"] = np.asarray(targets, np.float32)
    np.savez(os.path.join(out_dir, f"latent_{index:06d}.npz"), **arrays)


def save_latent_metadata(out_dir: str, indices, extra: Optional[dict] = None):
    """Write/refresh metadata (the reference checkpoints metadata every 10
    mixtures for restartability, src/ldm.py:378-382)."""
    Path(out_dir).mkdir(parents=True, exist_ok=True)
    np.savez(os.path.join(out_dir, "metadata.npz"),
             indices=np.asarray(list(indices), np.int64),
             **(extra or {}))


@dataclasses.dataclass
class LatentDataset:
    """Items: (targets (n_src, T) from `base_dataset`, latent
    (n_src, D, T_lat) from the cache)."""

    cache_dir: str
    base_dataset: object
    cache_size: int = 32  # small in-memory cache like the reference

    def __post_init__(self):
        meta = np.load(os.path.join(self.cache_dir, "metadata.npz"))
        self.indices = meta["indices"]
        # cache index -> source item (n_samples_per_item > 1 writes
        # several cache entries per source item; without this map the
        # fallback target lookup would index the base dataset with
        # cache indices — wrong items or IndexError)
        self.base_indices = (meta["base_indices"]
                             if "base_indices" in meta else self.indices)
        self._cache: dict = {}

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        idx = int(self.indices[i])
        if i in self._cache:
            latent, tgt = self._cache[i]
        else:
            data = np.load(os.path.join(
                self.cache_dir, f"latent_{idx:06d}.npz"))
            latent = data["latent"]
            # prefer the crop stored WITH the latent (exact supervision);
            # fall back to re-reading the base dataset for old caches
            tgt = data["targets"] if "targets" in data else None
            if len(self._cache) < self.cache_size:
                self._cache[i] = (latent, tgt)
        if tgt is None:
            _, tgt = self.base_dataset[int(self.base_indices[i])]
        return tgt, latent
