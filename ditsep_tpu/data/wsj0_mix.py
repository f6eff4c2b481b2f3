"""WSJ0-mix / LibriMix directory-layout datasets and collators.

Re-design of the reference data layer (reference: src/datasets/wsj0_mix.py
:16-150 and src/datasets/vctk_demand.py:21-114) for a TPU input pipeline:

* Pure numpy on the host (wav IO via scipy), no torch DataLoader.
* **Bucketed static shapes**: jit recompiles per input shape, so the batch
  iterator pads every batch up to a fixed length bucket (the biggest
  TPU-specific data-layer decision; the reference pads to the longest item
  per batch, giving unbounded shape diversity).
"""
from __future__ import annotations

import dataclasses
import math
import os
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

# split name maps (reference: src/datasets/wsj0_mix.py:16-24)
SPLITS_WSJ = {"train": "tr", "val": "cv", "test": "tt",
              "librimix_train-360": "train-360", "librimix_dev": "dev",
              "librimix_test": "test"}


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Load a wav file as float32 in [-1, 1]. Uses the native C++ decoder
    (ditsep_tpu.native) when built, else scipy."""
    from ditsep_tpu import native

    r = native.load_wav(path)
    if r is not None:
        data, fs = r
        return (data[0] if data.shape[0] == 1 else data), fs
    from scipy.io import wavfile

    fs, data = wavfile.read(path)
    if data.dtype == np.int16:
        data = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        data = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        data = (data.astype(np.float32) - 128.0) / 128.0
    else:
        data = data.astype(np.float32)
    if data.ndim == 2:
        data = data.T  # (C, T)
    return data, fs


def wav_num_samples(path: str) -> int:
    """Per-channel sample count from the WAV header alone (no audio
    decode) — lets length probes over a test set (eval bucketing) avoid
    reading every file twice. Falls back to a full decode for non-PCM
    containers the stdlib reader rejects."""
    import wave

    try:
        with wave.open(path, "rb") as w:
            return w.getnframes()
    except (wave.Error, EOFError):
        return int(np.atleast_2d(read_wav(path)[0]).shape[-1])


def write_wav(path: str, data: np.ndarray, fs: int) -> None:
    from scipy.io import wavfile

    data = np.asarray(data, np.float32)
    wavfile.write(path, fs, (np.clip(data, -1, 1) * 32767).astype(np.int16))


@dataclasses.dataclass
class WSJ0Mix:
    """2/3-speaker mixture dataset over the wsj0-mix or LibriMix directory
    layout (reference: src/datasets/wsj0_mix.py:27-101).

    Items: (mix (1, T), targets (n_spkr, T)) float32 numpy.
    """

    path: str
    n_spkr: int = 2
    cut: str = "max"
    split: str = "librimix_test"
    fs: int = 8000
    max_len_s: Optional[float] = None
    rng_seed: int = 0

    def __post_init__(self):
        split_dir = SPLITS_WSJ.get(self.split, self.split)
        root = Path(self.path)
        if "libri" in self.split:
            base = (root / f"Libri{self.n_spkr}Mix" / f"wav{self.fs//1000}k"
                    / self.cut / split_dir)
            self.mix_dir = base / "mix_both"
            if not self.mix_dir.exists():
                self.mix_dir = base / "mix_clean"
            self.src_dirs = [base / f"s{i+1}" for i in range(self.n_spkr)]
        else:
            base = (root / f"{self.n_spkr}speakers"
                    / f"wav{self.fs//1000}k" / self.cut / split_dir)
            self.mix_dir = base / "mix"
            self.src_dirs = [base / f"s{i+1}" for i in range(self.n_spkr)]
        if self.mix_dir.exists():
            self.files = sorted(os.listdir(self.mix_dir))
            self.files = [f for f in self.files if f.endswith(".wav")]
        else:
            self.files = []
        self._rng = np.random.default_rng(self.rng_seed)

    def __len__(self) -> int:
        return len(self.files)

    def item_length(self, idx: int) -> int:
        """Sample count of item ``idx`` from the WAV header only (the
        eval harness probes every length before batching; decoding
        mix + n_spkr sources per item just for shapes would double the
        dataset I/O)."""
        t = wav_num_samples(str(self.mix_dir / self.files[idx]))
        if self.max_len_s is not None:
            t = min(t, int(self.max_len_s * self.fs))
        return t

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        fname = self.files[idx]
        mix, _ = read_wav(str(self.mix_dir / fname))
        srcs = [read_wav(str(d / fname))[0] for d in self.src_dirs]
        mix = np.atleast_2d(mix)
        tgt = np.stack([np.atleast_1d(s).reshape(-1) for s in srcs])
        mix = mix.reshape(1, -1)
        # random crop (reference: wsj0_mix.py:95-99)
        if self.max_len_s is not None:
            max_len = int(self.max_len_s * self.fs)
            t = mix.shape[-1]
            if t > max_len:
                start = int(self._rng.integers(0, t - max_len + 1))
                mix = mix[:, start:start + max_len]
                tgt = tgt[:, start:start + max_len]
        return mix, tgt


@dataclasses.dataclass
class SyntheticMixDataset:
    """Deterministic synthetic mixtures for tests/benchmarks without data
    on disk. Sources occupy distinct spectral bands per source index
    (lowpass noise for source 0, highpassed for source 1, band-passed
    beyond) so the separation task is well-posed and learnable -- unlike
    i.i.d. broadband sources, which are fundamentally unseparable."""

    n_items: int = 16
    n_spkr: int = 2
    fs: int = 8000
    min_len_s: float = 2.0
    max_len_s: float = 6.0
    seed: int = 0

    def __len__(self):
        return self.n_items

    def item_length(self, idx: int) -> int:
        """Length without generating the audio (the length is the first
        draw of the item's deterministic rng stream)."""
        rng = np.random.default_rng(self.seed + idx)
        return int(rng.uniform(self.min_len_s, self.max_len_s) * self.fs)

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        t = int(rng.uniform(self.min_len_s, self.max_len_s) * self.fs)
        srcs = []
        for s in range(self.n_spkr):
            x = rng.standard_normal(t).astype(np.float32)
            k = int(rng.integers(12, 24))
            low = np.convolve(x, np.ones(k, np.float32) / k, mode="same")
            if s == 0:
                x = low
            elif s == 1:
                x = x - low  # highpass complement
            else:
                k2 = int(rng.integers(3, 6))
                mid = np.convolve(x, np.ones(k2, np.float32) / k2,
                                  mode="same")
                x = mid - low  # band-pass
            # slow amplitude modulation for temporal structure
            env = 0.5 + 0.5 * np.sin(
                2 * np.pi * rng.uniform(0.5, 2.0)
                * np.arange(t) / self.fs + rng.uniform(0, 6.28))
            x = x * env.astype(np.float32)
            srcs.append(0.3 * x / (np.std(x) + 1e-6) * rng.uniform(0.5, 1.0))
        tgt = np.stack(srcs)
        mix = tgt.sum(axis=0, keepdims=True)
        return mix.astype(np.float32), tgt.astype(np.float32)


@dataclasses.dataclass
class SyntheticTonalMixDataset:
    """Deterministic harmonic-tone mixtures for LATENT-pipeline tests and
    learning loops. Each source is a sum of harmonics of a slowly gliding
    fundamental with slow amplitude modulation — a low-dof parametric
    signal (tens of dof/s) that survives a compressive VAE bottleneck.

    This matters: SyntheticMixDataset's band-split NOISE sources carry a
    waveform dof rate (~2x bandwidth; the highpass complement is
    ~6800 dof/s at fs=8k) far above a 64x-compressed latent rate
    (125 fr/s x latent_dim), so NO codec can reconstruct them and any
    VAE-bottlenecked pipeline is ceiling-gated at noise level regardless
    of training. Speech is codec-compressible; these tones are its
    minimal synthetic stand-in. Sources stay separable the same way
    (disjoint f0 ranges per source index: ~100-170 Hz, ~380-640 Hz,
    ~950-1600 Hz)."""

    n_items: int = 16
    n_spkr: int = 2
    fs: int = 8000
    min_len_s: float = 2.0
    max_len_s: float = 6.0
    seed: int = 0

    def __len__(self):
        return self.n_items

    def item_length(self, idx: int) -> int:
        rng = np.random.default_rng(self.seed + idx)
        return int(rng.uniform(self.min_len_s, self.max_len_s) * self.fs)

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed + idx)
        t_len = int(rng.uniform(self.min_len_s, self.max_len_s) * self.fs)
        t = np.arange(t_len, dtype=np.float64) / self.fs
        srcs = []
        for s in range(self.n_spkr):
            base = 100.0 * (3.8 ** s)
            f0 = rng.uniform(base, 1.7 * base)
            # slow vibrato makes f0 a trajectory, not a constant
            vib = 1.0 + 0.02 * np.sin(
                2 * np.pi * rng.uniform(0.5, 2.0) * t + rng.uniform(0, 6.28))
            phase = 2 * np.pi * np.cumsum(f0 * vib) / self.fs
            n_harm = max(1, min(6, int(0.9 * self.fs / 2 / (1.7 * base))))
            x = np.zeros(t_len)
            for h in range(1, n_harm + 1):
                x += np.sin(h * phase + rng.uniform(0, 6.28)) / h
            env = 0.5 + 0.5 * np.sin(
                2 * np.pi * rng.uniform(0.5, 2.0) * t + rng.uniform(0, 6.28))
            x = (x * env).astype(np.float32)
            srcs.append(0.3 * x / (np.std(x) + 1e-6) * rng.uniform(0.5, 1.0))
        tgt = np.stack(srcs)
        mix = tgt.sum(axis=0, keepdims=True)
        return mix.astype(np.float32), tgt.astype(np.float32)


def max_collator(batch: Sequence[Tuple[np.ndarray, ...]],
                 pad_to: Optional[int] = None, align: str = "center"):
    """Pad every signal to the longest (or to `pad_to`), centered
    (reference: src/datasets/wsj0_mix.py:104-120).

    ``align='left'`` puts all padding at the end instead, so padded
    waveforms have trailing quiet exactly like the score model's own
    %64 frame padding — the layout the reference model sees at native
    lengths (used by the eval harness; see eval/evaluate.py)."""
    max_len = max(b[0].shape[-1] for b in batch)
    if pad_to is not None:
        max_len = max(max_len, pad_to)
    out: List[np.ndarray] = []
    n_fields = len(batch[0])
    for i in range(n_fields):
        field = [b[i] for b in batch]
        native_out = (_native_collate_center(field, max_len)
                      if align == "center" else None)
        if native_out is not None:
            out.append(native_out)
            continue
        arrs = []
        for x in field:
            pad = max_len - x.shape[-1]
            lo = 0 if align == "left" else pad // 2
            arrs.append(np.pad(x, [(0, 0)] * (x.ndim - 1)
                               + [(lo, pad - lo)]))
        out.append(np.stack(arrs))
    return tuple(out)


def _native_collate_center(field: Sequence[np.ndarray], max_len: int
                           ) -> Optional[np.ndarray]:
    """Centered collation of one batch field through the C library
    (native/ditsep_io.cpp ditsep_collate_center): each (C, T) item's
    channels are flattened into mono rows, collated into one contiguous
    (sum_C, max_len) buffer, and reshaped back. Returns None (numpy
    fallback) when the library is absent or the field isn't uniform
    float32 (C, T)."""
    from ditsep_tpu import native

    if not all(x.ndim == 2 and x.dtype == np.float32 for x in field):
        return None
    c = field[0].shape[0]
    if any(x.shape[0] != c for x in field):
        return None
    rows = [x[j] for x in field for j in range(c)]
    flat = native.collate_center(rows, max_len)
    if flat is None:
        return None
    return flat.reshape(len(field), c, max_len)


def length_buckets(lengths: Sequence[int], n_buckets: int = 8,
                   multiple: int = 2048) -> List[int]:
    """Choose bucket boundaries (padded lengths) from the empirical length
    distribution, rounded up to `multiple` for friendly STFT/VAE shapes."""
    qs = np.quantile(np.asarray(lengths), np.linspace(0, 1, n_buckets + 1))
    bounds = sorted({int(math.ceil(q / multiple)) * multiple
                     for q in qs[1:]})
    return bounds


@dataclasses.dataclass
class BucketedLoader:
    """Batch iterator with static-shape buckets.

    Items are grouped by padded-length bucket; every emitted batch has
    shape (batch_size, ..., bucket_len) so jit compiles once per bucket
    instead of once per unique length. `lengths` fall back to a full scan.
    """

    dataset: object
    batch_size: int = 8
    n_buckets: int = 8
    multiple: int = 2048
    shuffle: bool = True
    seed: int = 0
    drop_remainder: bool = False
    # (n_fft, hop, block) of the score model's STFT: bucket boundaries
    # then fall on 64-frame block edges so padding never pushes an item
    # across its own frame block (the quality-dilution cliff measured in
    # docs/pad_dilution_r03.md — matters for val/si_sdr monitoring,
    # which drives checkpoint selection). None keeps sample-domain
    # buckets (latent/VAE paths). Distinct blocks are still capped at
    # n_buckets (each bucket is one XLA compile of the jitted val loss
    # AND sampler — a 1-60 s length spread would otherwise compile ~60
    # programs): the least-populated blocks merge upward, trading a
    # little extra padding on few items for bounded compiles.
    frame_spec: Optional[Tuple[int, int, int]] = None
    # batch padding layout (max_collator align): "center" matches the
    # reference's training collator (src/datasets/wsj0_mix.py:104-120);
    # validation/eval should use "left" so padding is trailing quiet,
    # the layout the model sees at native lengths and in the test-eval
    # harness (eval/evaluate.py).
    align: str = "center"
    # yield_counts=True appends each batch's REAL item count (before the
    # remainder-fill) to the yielded tuple, so metric consumers can
    # weight out the filler
    yield_counts: bool = False

    def __post_init__(self):
        get_len = getattr(self.dataset, "item_length", None)
        self._lengths = ([get_len(i) for i in range(len(self.dataset))]
                         if get_len else
                         [self.dataset[i][0].shape[-1]
                          for i in range(len(self.dataset))])
        if self.frame_spec is not None:
            from ditsep_tpu.ops.stft import n_frames_prepadded
            n_fft, hop, block = self.frame_spec
            hist: dict = {}
            for L in self._lengths:
                k = -(-n_frames_prepadded(L, n_fft, hop) // block)
                hist[k] = hist.get(k, 0) + 1
            if len(hist) > self.n_buckets:
                moved = 0
                while len(hist) > self.n_buckets:
                    order = sorted(hist)
                    cand = min(order[:-1], key=lambda k: hist[k])
                    nxt = order[order.index(cand) + 1]
                    cnt = hist.pop(cand)
                    moved += cnt
                    hist[nxt] = hist.get(nxt, 0) + cnt
                print(f"[BucketedLoader] merged {moved} items into higher "
                      f"frame blocks (n_buckets={self.n_buckets}); their "
                      f"padded quiet fraction exceeds native")
            # max sample count whose frames fit block k (same closed form
            # as ops/stft.frame_block_padded_len)
            self._bounds = [hop * block * k - 1 - (n_fft - hop)
                            for k in sorted(hist)]
        else:
            self._bounds = length_buckets(self._lengths, self.n_buckets,
                                          self.multiple)

    def bucket_of(self, length: int) -> int:
        for b in self._bounds:
            if length <= b:
                return b
        return self._bounds[-1]

    def __iter__(self) -> Iterator[Tuple[np.ndarray, ...]]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed).shuffle(order)
        pools: dict = {}
        for idx in order:
            L = self._lengths[idx]
            b = self.bucket_of(L)
            pools.setdefault(b, []).append(idx)
            if len(pools[b]) == self.batch_size:
                items = [self.dataset[i] for i in pools.pop(b)]
                out = max_collator(items, pad_to=b, align=self.align)
                yield out + (len(items),) if self.yield_counts else out
        if not self.drop_remainder:
            for b, idxs in pools.items():
                if not idxs:
                    continue
                # fill the batch up to batch_size by CYCLING the real
                # items (static batch shape; cycling spreads the filler
                # evenly so a batch-mean metric stays nearly unbiased,
                # unlike repeating only the last item); consumers can
                # weight exactly via yield_counts
                items = [self.dataset[i] for i in idxs]
                n_real = len(items)
                while len(items) < self.batch_size:
                    items.append(items[len(items) % n_real])
                out = max_collator(items, pad_to=b, align=self.align)
                yield out + (n_real,) if self.yield_counts else out
