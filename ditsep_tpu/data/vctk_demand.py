"""VCTK-DEMAND (Valentini) speech-enhancement dataset.

Re-design of the reference NoisyDataset / Valentini_Module
(reference: src/datasets/vctk_demand.py:21-114): enhancement framed as
2-source separation -- items are (noisy (1,T), [clean, noise] (2,T)).

Notes vs the reference:

* The reference's ``augmentation=True`` permutes the *channel* dim of
  the noise (``torch.randperm(clean.size(0))``, vctk_demand.py:73-76),
  which is a no-op for the mono Valentini corpus it is configured on --
  intentionally not reproduced.
* ``Valentini_Module.setup`` (vctk_demand.py:92-98) holds out a random
  10% of the train set as validation; here the split is deterministic
  (seeded permutation of the file list) so train/val never overlap
  across processes or restarts.
* Both directory layouts are accepted: the Valentini-native
  ``{noisy,clean}_{split}set_wav`` and the reference's preprocessed
  ``{split}/{noisy,clean}``.
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ditsep_tpu.data.wsj0_mix import read_wav


def _resolve_dirs(root: Path, part: str) -> Tuple[Path, Path]:
    """Locate (noisy_dir, clean_dir) for a corpus part ('train'|'test')."""
    candidates = [
        (root / f"noisy_{part}set_wav", root / f"clean_{part}set_wav"),
        (root / part / "noisy", root / part / "clean"),
    ]
    for noisy, clean in candidates:
        if noisy.exists():
            return noisy, clean
    return candidates[0]


@dataclasses.dataclass
class NoisyDataset:
    """(reference: src/datasets/vctk_demand.py:21-89). Tiles or crops every
    item to `len_s` seconds (4 s default). ``split`` may be 'train',
    'val' (deterministic 10% holdout of the train files -- reference
    Valentini_Module.setup, :92-98) or 'test'."""

    path: str
    split: str = "train"  # 'train' | 'val' | 'test'
    fs: int = 16000
    len_s: Optional[float] = 4.0
    rng_seed: int = 0
    val_fraction: float = 0.1

    def __post_init__(self):
        if self.split not in ("train", "val", "test"):
            raise ValueError(f"bad split {self.split!r}")
        part = "test" if self.split == "test" else "train"
        self.noisy_dir, self.clean_dir = _resolve_dirs(Path(self.path), part)
        files: List[str] = []
        if self.noisy_dir.exists():
            files = sorted(
                f for f in os.listdir(self.noisy_dir) if f.endswith(".wav"))
        if self.split in ("train", "val") and files:
            perm = np.random.default_rng(self.rng_seed).permutation(len(files))
            # at least one val file whenever any exist (int() would
            # truncate to an empty split below 1/val_fraction files,
            # leaving val metrics NaN)
            n_val = max(1, int(len(files) * self.val_fraction))
            keep = perm[:n_val] if self.split == "val" else perm[n_val:]
            files = [files[i] for i in sorted(keep)]
        self.files = files
        self._rng = np.random.default_rng(self.rng_seed)

    def __len__(self):
        return len(self.files)

    def item_length(self, idx: int) -> int:
        """Sample count from the WAV header only (eval length probes)."""
        from ditsep_tpu.data.wsj0_mix import wav_num_samples

        if self.len_s is not None:
            return int(self.len_s * self.fs)  # tiled/cropped exactly
        return wav_num_samples(str(self.noisy_dir / self.files[idx]))

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        f = self.files[idx]
        noisy, _ = read_wav(str(self.noisy_dir / f))
        clean, _ = read_wav(str(self.clean_dir / f))
        noisy = noisy.reshape(1, -1)
        clean = clean.reshape(1, -1)
        if self.len_s is not None:
            target_len = int(self.len_s * self.fs)
            t = noisy.shape[-1]
            if t < target_len:  # tile (reference: :66-71)
                reps = -(-target_len // t)
                noisy = np.tile(noisy, (1, reps))[:, :target_len]
                clean = np.tile(clean, (1, reps))[:, :target_len]
            elif t > target_len:  # random crop (reference: :72-76)
                s = int(self._rng.integers(0, t - target_len + 1))
                noisy = noisy[:, s:s + target_len]
                clean = clean[:, s:s + target_len]
        noise = noisy - clean
        tgt = np.concatenate([clean, noise], axis=0)
        return noisy.astype(np.float32), tgt.astype(np.float32)
