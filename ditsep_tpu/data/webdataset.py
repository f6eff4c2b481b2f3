"""Streaming tar-shard ("WebDataset") reader for large-scale training.

TPU-native re-design of the reference's S3/WebDataset pipeline
(reference: src/stable_audio_tools/data/dataset.py:404-800
``S3DatasetConfig``/``LocalWebDatasetConfig``/``WebDatasetDataLoader``):
datasets are stored as tar shards of (audio, json) pairs; shards stream
sequentially, samples shuffle through a bounded buffer, and work splits
across hosts/workers by shard.

Differences from the reference (deliberate):
* no `webdataset` package -- the tar protocol is small and implemented
  here directly on the stdlib (tarfile over a file or a subprocess pipe);
* S3 access shells out to the aws CLI exactly like webdataset's gopen
  (``aws s3 cp <url> -``) and is gated on the CLI being installed;
* multi-host sharding keys on jax.process_index/process_count instead of
  torch DataLoader worker ids: every host reads a disjoint shard slice,
  matching how pjit training consumes per-host batches;
* decoding supports wav (native C++ decoder or scipy) + json/txt
  metadata; other audio codecs are out of scope for this image and raise
  a clear error.
"""
from __future__ import annotations

import dataclasses
import io
import json
import random
import subprocess
import tarfile
from typing import Callable, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ditsep_tpu.data.dataset import PadCropNormalized

_AUDIO_EXTS = (".wav",)
_META_EXTS = (".json", ".txt")


@dataclasses.dataclass(frozen=True)
class LocalWebDatasetConfig:
    """(reference: dataset.py LocalWebDatasetConfig): local directory or
    explicit list of .tar shard paths."""

    id: str
    path: str
    custom_metadata_fn: Optional[Callable] = None

    def shard_urls(self) -> List[str]:
        import os

        if self.path.endswith(".tar"):
            return [self.path]
        out = []
        for root, _, files in os.walk(self.path):
            out.extend(os.path.join(root, f) for f in sorted(files)
                       if f.endswith(".tar"))
        return sorted(out)


@dataclasses.dataclass(frozen=True)
class S3DatasetConfig:
    """(reference: dataset.py:404-460 S3DatasetConfig): lists shard URLs
    with `aws s3 ls` and streams them with `aws s3 cp <url> -`. Gated on
    the aws CLI being installed."""

    id: str
    s3_path: str
    custom_metadata_fn: Optional[Callable] = None
    profile: Optional[str] = None

    def _aws(self, *args) -> List[str]:
        cmd = ["aws"]
        if self.profile:
            cmd += ["--profile", self.profile]
        return cmd + list(args)

    def shard_urls(self) -> List[str]:
        try:
            res = subprocess.run(
                self._aws("s3", "ls", "--recursive", self.s3_path),
                capture_output=True, text=True, timeout=120)
        except FileNotFoundError as e:
            raise RuntimeError(
                "S3 dataset configured but the aws CLI is not installed "
                "in this image") from e
        if res.returncode != 0:
            raise RuntimeError(
                f"aws s3 ls {self.s3_path!r} failed "
                f"(exit {res.returncode}): {res.stderr.strip()[:500]}")
        bucket = self.s3_path.split("/")[2]
        return sorted(
            f"s3://{bucket}/" + line.split()[-1]
            for line in res.stdout.splitlines()
            if line.strip().endswith(".tar"))


def _open_shard(url: str, profile: Optional[str] = None):
    """(file object, Popen-or-None) for a shard path/URL (gopen
    equivalent). The caller must wait() the process after closing the
    stream (zombie reaping + surfacing download failures)."""
    if url.startswith("s3://"):
        cmd = ["aws"]
        if profile:
            cmd += ["--profile", profile]
        proc = subprocess.Popen(cmd + ["s3", "cp", url, "-"],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE)
        return proc.stdout, proc
    return open(url, "rb"), None


def _decode_audio(name: str, payload: bytes):
    if name.endswith(".wav"):
        from ditsep_tpu.data.wsj0_mix import read_wav
        import os
        import tempfile

        # the native/scipy decoders take paths; spool tiny temp files
        with tempfile.NamedTemporaryFile(suffix=".wav",
                                         delete=False) as f:
            f.write(payload)
            tmp = f.name
        try:
            data, fs = read_wav(tmp)
        finally:
            os.unlink(tmp)
        if data.ndim == 1:
            data = data[None]
        return np.asarray(data, np.float32), fs
    raise ValueError(
        f"unsupported audio member {name!r}: this image decodes wav only "
        "(flac/mp3 decoders are not installed)")


def iter_tar_samples(url: str, profile: Optional[str] = None
                     ) -> Iterator[Dict]:
    """Yield {'__key__', 'audio', 'sample_rate', 'json'} dicts from one
    shard, grouping members by basename like webdataset does. A .txt
    member lands under json['caption'] WITHOUT clobbering a .json
    member's other fields (and vice versa)."""
    fileobj, proc = _open_shard(url, profile)
    try:
        with tarfile.open(fileobj=fileobj, mode="r|*") as tf:
            cur_key = None
            cur: Dict = {}
            for member in tf:
                if not member.isfile():
                    continue
                base = member.name
                stem, dot, ext = base.rpartition(".")
                ext = dot + ext
                if cur_key is not None and stem != cur_key and cur:
                    if "audio" in cur:
                        yield cur
                    cur = {}
                cur_key = stem
                cur["__key__"] = stem
                payload = tf.extractfile(member).read()
                if ext in _AUDIO_EXTS:
                    audio, fs = _decode_audio(base, payload)
                    cur["audio"] = audio
                    cur["sample_rate"] = fs
                elif ext == ".json":
                    merged = dict(cur.get("json") or {})
                    merged.update(json.loads(payload.decode("utf-8")))
                    cur["json"] = merged
                elif ext == ".txt":
                    merged = dict(cur.get("json") or {})
                    merged.setdefault("caption", payload.decode("utf-8"))
                    cur["json"] = merged
            if cur and "audio" in cur:
                yield cur
    finally:
        try:
            fileobj.close()
        except Exception:
            pass
        if proc is not None:
            # reap the aws child (zombies otherwise accumulate over an
            # epoch of shards) and surface download failures that tar
            # reports only as an opaque truncation
            try:
                err = (proc.stderr.read() or b"").decode(
                    "utf-8", "replace") if proc.stderr else ""
                rc = proc.wait(timeout=30)
                if rc != 0:
                    import warnings
                    warnings.warn(f"aws s3 cp {url!r} exited {rc}: "
                                  f"{err.strip()[:300]}", stacklevel=2)
            except Exception:
                proc.kill()


def _resample(audio: np.ndarray, fs: int, target: int) -> np.ndarray:
    """Polyphase resample (C, T) audio from fs to target Hz
    (reference: dataset.py:746-748 torchaudio.functional.resample)."""
    import math

    from scipy.signal import resample_poly

    g = math.gcd(fs, target)
    return np.asarray(
        resample_poly(audio, target // g, fs // g, axis=-1), np.float32)


@dataclasses.dataclass
class WebDatasetDataLoader:
    """Streaming loader over tar shards (reference: dataset.py:600-800).

    Yields collated numpy batches (audio (B, C, T), list-of-metadata):
    shards are split across hosts, optionally resampled with replacement
    (infinite stream bounded by epoch_steps), samples pass through a
    shuffle buffer and the PadCrop/channel-force/volume transforms.
    """

    configs: Sequence
    sample_rate: int = 8000
    sample_size: int = 65536
    batch_size: int = 8
    random_crop: bool = True
    force_channels: str = "mono"
    shuffle_buffer: int = 256
    epoch_steps: int = 2000
    resampled_shards: bool = True
    seed: int = 0

    def _my_shards(self) -> List[str]:
        urls: List[str] = []
        self._url_cfg = {}
        for c in self.configs:
            for u in c.shard_urls():
                urls.append(u)
                self._url_cfg[u] = c
        if not urls:
            raise FileNotFoundError("no .tar shards found")
        # disjoint slice per host (jax process) -- the pjit analogue of
        # webdataset's split_by_node
        try:
            import jax
            rank, world = jax.process_index(), jax.process_count()
        except Exception:
            rank, world = 0, 1
        return urls[rank::world] or urls[:1]

    def _sample_stream(self) -> Iterator[Dict]:
        # mix the epoch counter into the seed: a fresh __iter__ must not
        # replay the identical shard order / shuffle / crops every epoch
        rng = random.Random(self.seed * 1_000_003 + self._epoch)
        shards = self._my_shards()
        while True:
            order = ([rng.choice(shards) for _ in shards]
                     if self.resampled_shards
                     else rng.sample(shards, len(shards)))
            for url in order:
                cfg = self._url_cfg.get(url)
                profile = getattr(cfg, "profile", None)
                fn = getattr(cfg, "custom_metadata_fn", None)
                for sample in iter_tar_samples(url, profile=profile):
                    if fn is not None:
                        sample["__custom_fn__"] = fn
                    yield sample
            if not self.resampled_shards:
                return

    def __iter__(self):
        self._epoch = getattr(self, "_epoch", -1) + 1
        rng = np.random.default_rng((self.seed, self._epoch))
        pad_crop = PadCropNormalized(self.sample_size,
                                     randomize=self.random_crop)
        buf: List[Dict] = []
        batch_audio: List[np.ndarray] = []
        batch_meta: List[Dict] = []
        steps = 0
        stream = self._sample_stream()

        def prepare(sample):
            audio = sample["audio"]
            fs = int(sample.get("sample_rate", self.sample_rate))
            if fs != self.sample_rate:
                # the reference resamples every sample to the configured
                # rate (reference: dataset.py:746-748); do the same with
                # a polyphase resampler instead of silently yielding
                # wrong-rate audio
                audio = _resample(audio, fs, self.sample_rate)
            if self.force_channels == "mono" and audio.shape[0] > 1:
                audio = audio.mean(axis=0, keepdims=True)
            elif self.force_channels == "stereo" and audio.shape[0] == 1:
                audio = np.repeat(audio, 2, axis=0)
            cropped, rel_start, total = pad_crop(rng, audio)
            meta = dict(sample.get("json", {}))
            meta["seconds_start"] = rel_start * total / self.sample_rate
            meta["seconds_total"] = total / self.sample_rate
            meta["__key__"] = sample.get("__key__")
            fn = sample.get("__custom_fn__")
            if fn is not None:
                # per-config metadata hook (reference: dataset.py
                # custom_metadata_fn(info, audio) merged into info)
                extra = fn(meta, audio)
                if extra:
                    meta.update(extra)
            return np.asarray(cropped, np.float32), meta

        for sample in stream:
            if len(buf) < self.shuffle_buffer:
                buf.append(sample)
                continue
            idx = int(rng.integers(len(buf)))
            buf[idx], sample = sample, buf[idx]
            audio, meta = prepare(sample)
            batch_audio.append(audio)
            batch_meta.append(meta)
            if len(batch_audio) == self.batch_size:
                yield np.stack(batch_audio), batch_meta
                batch_audio, batch_meta = [], []
                steps += 1
                if steps >= self.epoch_steps:
                    return
        rng.shuffle(buf)
        for sample in buf:
            audio, meta = prepare(sample)
            batch_audio.append(audio)
            batch_meta.append(meta)
            if len(batch_audio) == self.batch_size:
                yield np.stack(batch_audio), batch_meta
                batch_audio, batch_meta = [], []
                steps += 1
                if steps >= self.epoch_steps:
                    return


def create_dataloader_from_config(dataset_config: Dict, batch_size: int,
                                  sample_size: int, sample_rate: int,
                                  audio_channels: int = 1,
                                  shuffle: bool = True):
    """Config dispatch matching the reference
    (reference: dataset.py:803-960): 'audio_dir' | 'pre_encoded' |
    's3' | 'wds'. Returns an iterable of collated numpy batches."""
    from ditsep_tpu.data.dataset import PreEncodedDataset, SampleDataset

    dataset_type = dataset_config.get("dataset_type")
    assert dataset_type is not None, "dataset_type must be specified"
    force_channels = "mono" if audio_channels == 1 else "stereo"

    if dataset_type == "audio_dir":
        paths = [d["path"] for d in dataset_config["datasets"]]
        ds = SampleDataset(paths=paths, sample_size=sample_size,
                           random_crop=dataset_config.get("random_crop",
                                                          True),
                           force_channels=force_channels)
        return _simple_loader(ds, batch_size, shuffle)
    if dataset_type == "pre_encoded":
        sets = [PreEncodedDataset(path=d["path"])
                for d in dataset_config["datasets"]]
        ds = _Concat(sets)
        return _simple_loader(ds, batch_size, shuffle)
    if dataset_type in ("s3", "wds"):
        configs = []
        for c in dataset_config["datasets"]:
            if "s3_path" in c:
                configs.append(S3DatasetConfig(
                    id=c["id"], s3_path=c["s3_path"],
                    profile=c.get("profile")))
            else:
                configs.append(LocalWebDatasetConfig(
                    id=c["id"], path=c["path"]))
        return WebDatasetDataLoader(
            configs, sample_rate=sample_rate, sample_size=sample_size,
            batch_size=batch_size,
            random_crop=dataset_config.get("random_crop", True),
            force_channels=force_channels,
            epoch_steps=dataset_config.get("epoch_steps", 2000),
            resampled_shards=dataset_config.get("resampled_shards", True))
    raise NotImplementedError(f"Unknown dataset_type: {dataset_type}")


class _Concat:
    """Chain map-style datasets (torch ConcatDataset equivalent)."""

    def __init__(self, sets):
        self.sets = sets

    def __len__(self):
        return sum(len(s) for s in self.sets)

    def __getitem__(self, idx):
        for s in self.sets:
            if idx < len(s):
                return s[idx]
            idx -= len(s)
        raise IndexError(idx)


class _simple_loader:
    """Minimal map-style batching loader (no torch DataLoader). Items
    may be (audio, meta) tuples or bare arrays; audio stacks, metadata
    collates into a list (the reference's collation_fn contract).

    Re-iterable: each ``__iter__`` call walks the dataset afresh (a new
    epoch), with a per-epoch shuffle order. ``drop_last=False`` yields
    the trailing partial batch (torch DataLoader's default)."""

    def __init__(self, ds, batch_size: int, shuffle: bool,
                 drop_last: bool = False, seed: int = 0):
        self.ds = ds
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        n = len(self.ds)
        b = self.batch_size
        return n // b if self.drop_last else -(-n // b)

    def __iter__(self):
        idxs = list(range(len(self.ds)))
        if self.shuffle:
            random.Random(self.seed + self._epoch).shuffle(idxs)
        self._epoch += 1

        def collate(batch):
            if isinstance(batch[0], tuple):
                return (np.stack([b[0] for b in batch]),
                        [b[1] for b in batch])
            return np.stack(batch)

        batch = []
        for i in idxs:
            batch.append(self.ds[i])
            if len(batch) == self.batch_size:
                yield collate(batch)
                batch = []
        if batch and not self.drop_last:
            yield collate(batch)
