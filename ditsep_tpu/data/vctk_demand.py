"""VCTK-DEMAND (Valentini) speech-enhancement dataset.

Re-design of the reference NoisyDataset / Valentini_Module
(reference: src/datasets/vctk_demand.py:21-114): enhancement framed as
2-source separation -- items are (noisy (1,T), [clean, noise] (2,T)).
"""
from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ditsep_tpu.data.wsj0_mix import read_wav


@dataclasses.dataclass
class NoisyDataset:
    """(reference: src/datasets/vctk_demand.py:21-89). Tiles or crops every
    item to `len_s` seconds (4 s default)."""

    path: str
    split: str = "train"  # 'train' | 'test'
    fs: int = 16000
    len_s: Optional[float] = 4.0
    rng_seed: int = 0

    def __post_init__(self):
        root = Path(self.path)
        self.clean_dir = root / f"clean_{self.split}set_wav"
        self.noisy_dir = root / f"noisy_{self.split}set_wav"
        if self.noisy_dir.exists():
            self.files = sorted(
                f for f in os.listdir(self.noisy_dir) if f.endswith(".wav"))
        else:
            self.files = []
        self._rng = np.random.default_rng(self.rng_seed)

    def __len__(self):
        return len(self.files)

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
