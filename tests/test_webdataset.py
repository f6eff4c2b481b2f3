"""Streaming tar-shard reader tests (reference:
src/stable_audio_tools/data/dataset.py:404-960 WebDataset pipeline)."""
import io
import json
import os
import tarfile

import numpy as np
import pytest

from ditsep_tpu.data.webdataset import (
    LocalWebDatasetConfig, WebDatasetDataLoader, create_dataloader_from_config,
    iter_tar_samples)
from ditsep_tpu.data.wsj0_mix import write_wav


def _make_shard(path, n_items, fs=8000, seed=0, prefix="u"):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with tarfile.open(path, "w") as tf:
        for i in range(n_items):
            wav = rng.standard_normal(fs).astype(np.float32) * 0.3
            tmp = f"{path}.{i}.wav"
            write_wav(tmp, wav, fs)
            tf.add(tmp, arcname=f"{prefix}{i:04d}.wav")
            os.unlink(tmp)
            meta = json.dumps({"caption": f"item {i}", "idx": i}).encode()
            info = tarfile.TarInfo(f"{prefix}{i:04d}.json")
            info.size = len(meta)
            tf.addfile(info, io.BytesIO(meta))
    return path


def test_iter_tar_samples_groups_by_key(tmp_path):
    shard = _make_shard(str(tmp_path / "shards" / "s0.tar"), 5)
    samples = list(iter_tar_samples(shard))
    assert len(samples) == 5
    s = samples[0]
    assert s["audio"].shape == (1, 8000)
    assert s["sample_rate"] == 8000
    assert s["json"]["idx"] == 0
    assert s["__key__"] == "u0000"


def test_webdataset_loader_batches_and_bounds(tmp_path):
    root = str(tmp_path / "shards")
    for k in range(3):
        _make_shard(f"{root}/s{k}.tar", 6, seed=k, prefix=f"s{k}_u")
    cfg = LocalWebDatasetConfig(id="test", path=root)
    assert len(cfg.shard_urls()) == 3
    dl = WebDatasetDataLoader(
        [cfg], sample_rate=8000, sample_size=4000, batch_size=4,
        shuffle_buffer=8, epoch_steps=3, resampled_shards=True)
    batches = list(dl)
    assert len(batches) == 3  # epoch_steps bound on an infinite stream
    audio, metas = batches[0]
    assert audio.shape == (4, 1, 4000)
    assert len(metas) == 4
    assert all("caption" in m for m in metas)
    assert all(np.isfinite(audio).all() for audio, _ in batches)


def test_webdataset_loader_resamples_rate_mismatch(tmp_path):
    """Shards at a different decoded rate must be resampled to the
    configured sample_rate (reference: dataset.py:746-748), not silently
    yielded at the wrong rate."""
    shard = _make_shard(str(tmp_path / "shards" / "s0.tar"), 6, fs=16000)
    dl = WebDatasetDataLoader(
        [LocalWebDatasetConfig(id="t", path=shard)], sample_rate=8000,
        sample_size=4000, batch_size=2, shuffle_buffer=2, epoch_steps=2)
    batches = list(dl)
    audio, metas = batches[0]
    assert audio.shape == (2, 1, 4000)
    # 1 s @16k -> 1 s @8k = 8000 samples total; crop window is 4000
    assert all(abs(m["seconds_total"] - 1.0) < 0.01 for m in metas)


def test_simple_loader_reiterable_and_partial_batch(tmp_path):
    """audio_dir loaders must survive multiple epochs (a second epoch
    used to silently yield zero batches) and keep the trailing partial
    batch by default."""
    from ditsep_tpu.data.webdataset import _simple_loader

    class DS:
        def __len__(self):
            return 5

        def __getitem__(self, i):
            return np.full((1, 8), i, np.float32)

    ld = _simple_loader(DS(), batch_size=2, shuffle=True)
    e1, e2 = list(ld), list(ld)
    assert len(e1) == 3 and len(e2) == 3
    assert e1[-1].shape[0] == 1  # trailing partial batch kept
    assert len(ld) == 3
    ld2 = _simple_loader(DS(), batch_size=2, shuffle=False, drop_last=True)
    assert len(list(ld2)) == 2 and len(ld2) == 2


def test_webdataset_loader_finite_mode(tmp_path):
    root = str(tmp_path / "shards")
    _make_shard(f"{root}/s0.tar", 9)
    dl = WebDatasetDataLoader(
        [LocalWebDatasetConfig(id="t", path=root)], sample_size=2000,
        batch_size=2, shuffle_buffer=4, epoch_steps=100,
        resampled_shards=False)
    batches = list(dl)
    # 9 items -> 4 full batches of 2 (one leftover dropped)
    assert len(batches) == 4


def test_s3_config_gated_on_aws_cli():
    import shutil

    from ditsep_tpu.data.webdataset import S3DatasetConfig
    cfg = S3DatasetConfig(id="s", s3_path="s3://bucket/prefix/")
    if shutil.which("aws") is None:
        with pytest.raises(RuntimeError, match="aws CLI"):
            cfg.shard_urls()
    # aws present: listing may fail for auth reasons; gating is the
    # contract under test, not live S3 access


def test_create_dataloader_from_config_dispatch(tmp_path):
    root = str(tmp_path / "shards")
    _make_shard(f"{root}/s0.tar", 4)
    dl = create_dataloader_from_config(
        {"dataset_type": "wds",
         "datasets": [{"id": "a", "path": root}],
         "epoch_steps": 2},
        batch_size=2, sample_size=1000, sample_rate=8000,
        audio_channels=1)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0][0].shape == (2, 1, 1000)

    # audio_dir path
    adir = tmp_path / "audio"
    adir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        write_wav(str(adir / f"a{i}.wav"),
                  rng.standard_normal(3000).astype(np.float32) * 0.2, 8000)
    dl2 = create_dataloader_from_config(
        {"dataset_type": "audio_dir",
         "datasets": [{"id": "d", "path": str(adir)}]},
        batch_size=2, sample_size=1000, sample_rate=8000)
    b = next(iter(dl2))
    assert b[0].shape == (2, 1, 1000)

    with pytest.raises(NotImplementedError):
        create_dataloader_from_config({"dataset_type": "nope"},
                                      2, 100, 8000)
