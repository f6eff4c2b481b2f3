"""Data layer and evaluation harness tests."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.data import (
    BucketedLoader, LatentDataset, SyntheticMixDataset, max_collator,
    read_wav, save_latent_cache, save_latent_metadata, write_wav,
)
from ditsep_tpu.eval import (
    compute_metrics, evaluate_dataset, si_bss_eval_sources, stoi,
)


# ---------------------------------------------------------------- data ----
def test_wav_roundtrip(tmp_path):
    x = np.sin(np.linspace(0, 100, 8000)).astype(np.float32) * 0.5
    p = str(tmp_path / "t.wav")
    write_wav(p, x, 8000)
    y, fs = read_wav(p)
    assert fs == 8000
    np.testing.assert_allclose(y.reshape(-1), x, atol=1e-3)


def test_synthetic_dataset_shapes():
    ds = SyntheticMixDataset(n_items=4, n_spkr=2)
    mix, tgt = ds[0]
    assert mix.shape[0] == 1 and tgt.shape[0] == 2
    assert mix.shape[-1] == tgt.shape[-1]
    np.testing.assert_allclose(mix[0], tgt.sum(0), atol=1e-5)


def test_synthetic_tonal_dataset():
    """Tonal variant: deterministic, mix = sum of sources, disjoint f0
    bands per source (the property that keeps separation well-posed AND
    the waveform codec-compressible — see the dataset docstring)."""
    from ditsep_tpu.data import SyntheticTonalMixDataset

    ds = SyntheticTonalMixDataset(n_items=3, min_len_s=1.0, max_len_s=2.0)
    mix, tgt = ds[0]
    assert mix.shape[0] == 1 and tgt.shape[0] == 2
    np.testing.assert_allclose(mix[0], tgt.sum(0), atol=1e-5)
    m2, t2 = ds[0]
    np.testing.assert_array_equal(mix, m2)  # deterministic per index
    assert ds.item_length(0) == mix.shape[-1]
    # spectral disjointness: source 0 concentrates below 400 Hz, source 1
    # peaks above 300 Hz
    f = np.fft.rfftfreq(tgt.shape[-1], 1 / ds.fs)
    p0 = np.abs(np.fft.rfft(tgt[0])) ** 2
    p1 = np.abs(np.fft.rfft(tgt[1])) ** 2
    assert p0[f < 400].sum() / p0.sum() > 0.8
    assert f[np.argmax(p1)] > 300


def test_max_collator_pads_centered():
    a = (np.ones((1, 10), np.float32), np.ones((2, 10), np.float32))
    b = (np.ones((1, 6), np.float32), np.ones((2, 6), np.float32))
    mix, tgt = max_collator([a, b])
    assert mix.shape == (2, 1, 10) and tgt.shape == (2, 2, 10)
    assert mix[1, 0, 0] == 0 and mix[1, 0, 2] == 1  # centered pad


def test_bucketed_loader_static_shapes():
    ds = SyntheticMixDataset(n_items=12, min_len_s=1.0, max_len_s=5.0)
    loader = BucketedLoader(ds, batch_size=2, n_buckets=3, multiple=2048)
    shapes = set()
    count = 0
    for mix, tgt in loader:
        assert mix.shape[0] == 2
        assert mix.shape[-1] % 2048 == 0
        shapes.add(mix.shape[-1])
        count += mix.shape[0]
    assert count >= len(ds)
    assert len(shapes) <= 3 + 1


def test_latent_cache_roundtrip(tmp_path):
    ds = SyntheticMixDataset(n_items=3)
    for i in range(3):
        save_latent_cache(str(tmp_path), i,
                          np.random.randn(2, 4, 16).astype(np.float32))
    save_latent_metadata(str(tmp_path), range(3))
    lds = LatentDataset(str(tmp_path), ds)
    tgt, lat = lds[1]
    assert lat.shape == (2, 4, 16)
    assert tgt.shape[0] == 2


# ------------------------------------------------------------- metrics ----
def test_si_bss_eval_perfect():
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((2, 4000))
    sdr, sir, sar, perm = si_bss_eval_sources(ref, ref.copy())
    assert np.all(sdr > 60)
    assert list(perm) == [0, 1]


def test_si_bss_eval_permuted_and_noisy():
    rng = np.random.default_rng(1)
    ref = rng.standard_normal((2, 4000))
    est = ref[::-1] + 0.1 * rng.standard_normal((2, 4000))
    sdr, sir, sar, perm = si_bss_eval_sources(ref, est)
    assert list(perm) == [1, 0]
    assert np.all(sdr > 10) and np.all(sdr < 30)
    assert np.all(sir >= sdr - 1e-6)


def test_si_bss_eval_interference():
    """An estimate contaminated by the other source has low SIR."""
    rng = np.random.default_rng(2)
    ref = rng.standard_normal((2, 4000))
    est = np.stack([ref[0] + 0.5 * ref[1], ref[1]])
    sdr, sir, sar, perm = si_bss_eval_sources(ref, est)
    assert sir[0] < 12.0
    assert sar[0] > sdr[0]


def test_stoi_properties():
    rng = np.random.default_rng(0)
    t = 8000 * 3
    clean = rng.standard_normal(t) * 0.3
    v_same = stoi(clean, clean, 8000, extended=True)
    noisy = clean + 0.8 * rng.standard_normal(t)
    v_noisy = stoi(clean, noisy, 8000, extended=True)
    assert 0.95 <= v_same <= 1.001
    assert v_noisy < v_same
    v_classic = stoi(clean, noisy, 8000, extended=False)
    assert 0.0 <= v_classic <= 1.001


def test_compute_metrics_schema():
    rng = np.random.default_rng(0)
    tgt = rng.standard_normal((2, 16000)).astype(np.float32) * 0.3
    mix = tgt.sum(0, keepdims=True)
    est = tgt + 0.05 * rng.standard_normal((2, 16000)).astype(np.float32)
    m = compute_metrics(est, tgt, fs=8000)
    assert set(m) == {"si_sdr", "si_sir", "si_sar", "perm", "pesq",
                      "pesq_impl", "stoi"}
    assert len(m["si_sdr"]) == 2
    # pesq/stoi are per-source lists (the reference artifact schema)
    assert len(m["pesq"]) == 2 and len(m["stoi"]) == 2
    assert all(np.isnan(v) or v > 0 for v in m["pesq"])  # pkg optional
    assert m["pesq_impl"] in ("itu", "p862_numpy")


# ---------------------------------------------------------- eval harness --
def test_evaluate_dataset_surfaces_merged_dilution(tmp_path):
    """When --max-buckets forces utterances past their native frame
    block, the artifact must say so: per-utterance `merged_pad` flags,
    summary `merged_utterances` count + `merged_indices`, so a merged
    run is never mistaken for a native-parity one
    (docs/pad_dilution_r03.md measured the quality cost)."""
    import json

    import jax.numpy as jnp

    # 3 distinct 64-frame blocks (510/128 grid), cap at 2 -> one merge
    class _DS:
        lengths = [8000, 24000, 40000, 8000]

        def __len__(self):
            return len(self.lengths)

        def item_length(self, i):
            return self.lengths[i]

        def __getitem__(self, i):
            t = self.lengths[i]
            rng = np.random.default_rng(i)
            tgt = rng.standard_normal((2, t)).astype(np.float32) * 0.1
            return tgt.sum(0, keepdims=True), tgt

    sep = lambda key, mix: jnp.concatenate([mix * 0.6, mix * 0.4], axis=1)
    res = evaluate_dataset(sep, _DS(), fs=8000, batch_size=1,
                           frame_spec=(510, 128, 64), max_buckets=2,
                           warmup=False, out_dir=str(tmp_path),
                           split_name="test")
    assert res["summary"]["merged_utterances"] >= 1
    assert res["summary"]["merged_indices"]
    flagged = [k for k, r in res["results"].items() if r.get("merged_pad")]
    assert sorted(int(k) for k in flagged) == \
        res["summary"]["merged_indices"]
    # provenance in the written artifacts too
    on_disk = json.load(open(tmp_path / "test_summary.json"))
    assert on_disk["merged_utterances"] >= 1
    assert on_disk["pesq_impl"] in ("itu", "p862_numpy")
    # a run under the cap reports zero merges
    res2 = evaluate_dataset(sep, _DS(), fs=8000, batch_size=1,
                            frame_spec=(510, 128, 64), max_buckets=8,
                            warmup=False)
    assert res2["summary"]["merged_utterances"] == 0
    assert "merged_indices" not in res2["summary"]
    assert not any(r.get("merged_pad") for r in res2["results"].values())


def test_evaluate_dataset_mesh_partial_batch():
    """batch 4 on an 8-device mesh with a partial trailing chunk: the
    harness must pad every batch to a device-count multiple so sharding
    never fails on utterance counts the reference handles trivially
    (reference: src/evaluate_mp.py:466-514)."""
    import jax
    import jax.numpy as jnp

    from ditsep_tpu.parallel import make_mesh

    mesh = make_mesh()
    assert mesh.devices.size == 8
    ds = SyntheticMixDataset(n_items=5, min_len_s=0.4, max_len_s=0.5)
    shapes = []

    @jax.jit
    def sep(key, mix):
        return jnp.concatenate([mix * 0.6, mix * 0.4], axis=1)

    def separate_fn(key, mix):
        shapes.append(tuple(mix.shape))
        return sep(key, mix)

    res = evaluate_dataset(separate_fn, ds, fs=8000, batch_size=4,
                           bucket_multiple=4096, mesh=mesh, warmup=False)
    assert res["summary"]["number"] == 5
    assert all(s[0] % 8 == 0 for s in shapes), shapes


def test_evaluate_dataset_runtime_excludes_compile():
    """The recorded per-utterance runtime must be steady-state sampling
    only: the first call on each bucket shape (which pays XLA compile)
    happens in an untimed warmup (reference timing semantics:
    src/evaluate_mp.py:313-327)."""
    import time as _time

    import jax.numpy as jnp

    ds = SyntheticMixDataset(n_items=8, min_len_s=0.4, max_len_s=1.2)
    seen = set()

    def separate_fn(key, mix):
        shape = tuple(mix.shape)
        if shape not in seen:  # simulate a slow first-shape compile
            seen.add(shape)
            _time.sleep(0.5)
        return jnp.concatenate([mix * 0.6, mix * 0.4], axis=1)

    res = evaluate_dataset(separate_fn, ds, fs=8000, batch_size=2,
                           bucket_multiple=4096, warmup=True)
    assert res["summary"]["number"] == 8
    worst = max(r["runtime"] for r in res["results"].values())
    assert worst < 0.25, worst  # 0.5 s "compile" never lands in runtime


def test_bucket_consolidation_cap(capsys):
    """A long-tailed length distribution must compile at most max_buckets
    distinct shapes, every utterance still fits its padded length, and
    the consolidation is announced."""
    from ditsep_tpu.eval.evaluate import _bucket_lengths

    lengths = list(range(4000, 40001, 1357))
    assigned, merged = _bucket_lengths(lengths, 256, 4)
    shapes = set(assigned.values())
    assert len(shapes) <= 4
    assert all(assigned[i] >= L for i, L in enumerate(lengths))
    assert merged  # consolidation moved utterances off their own shape
    assert "consolidating" in capsys.readouterr().out
    # under the cap: no consolidation, exact rounding kept
    few = [5000, 5100, 9000]
    a2, m2 = _bucket_lengths(few, 256, 8)
    assert all(a2[i] % 256 == 0 and a2[i] >= L for i, L in enumerate(few))
    assert len(set(a2.values())) == 2  # 5000/5100 round together
    assert not m2


def test_frame_block_bucketing():
    """Eval buckets must never pad an utterance past its own 64-frame STFT
    block: the score model zero-pads frames to %64 (so every utterance
    already carries quiet columns through GroupNorm), and pushing one
    into the NEXT block jumps that quiet fraction discontinuously, which
    measurably destroys separation quality (+10 dB -> -8 dB on a trained
    checkpoint; docs/pad_dilution_r03.md). Frame-block bucketing keeps
    the quiet fraction identical to the reference's unpadded batch-1
    eval (reference: src/evaluate_mp.py:281-290 + score_models.py:83-91)."""
    from ditsep_tpu.eval.evaluate import _bucket_lengths_frames, _stft_frames

    spec = (510, 128, 64)
    blk = lambda L: -(-_stft_frames(L, 510, 128) // 64)
    rng = np.random.default_rng(3)
    lengths = [int(x) for x in rng.integers(16000, 200000, 200)]
    a, m = _bucket_lengths_frames(lengths, spec, max_buckets=32)
    assert not m
    for i, L in enumerate(lengths):
        assert a[i] >= L
        assert blk(a[i]) == blk(L), (L, a[i])
    # the measured cliff case: 32000-sample items must NOT pad to 32512+
    a32, _ = _bucket_lengths_frames([32000, 31000, 32256], spec, 8)
    assert all(blk(v) == blk(32000) == 4 for v in a32.values())
    assert max(a32.values()) == 32256


def test_frame_block_cap_merges(capsys):
    """Over max_buckets, the smallest blocks merge upward (never down,
    so padded >= native always holds) and the loss of native parity is
    announced."""
    from ditsep_tpu.eval.evaluate import _bucket_lengths_frames

    lengths = list(range(16000, 160001, 4111))
    a, merged = _bucket_lengths_frames(lengths, (510, 128, 64),
                                       max_buckets=4)
    assert len(set(a.values())) <= 4
    assert all(a[i] >= L for i, L in enumerate(lengths))
    assert merged  # the affected indices are reported, not just printed
    assert "merged" in capsys.readouterr().out


def test_bucketed_loader_frame_spec():
    """With frame_spec, training/val bucket boundaries fall on 64-frame
    STFT block edges, so no item is padded past its own block (the
    val/si_sdr monitor then sees native-equivalent quality)."""
    from ditsep_tpu.data.wsj0_mix import BucketedLoader

    ds = SyntheticMixDataset(n_items=10, min_len_s=2.0, max_len_s=6.0,
                             seed=1)
    bl = BucketedLoader(ds, batch_size=2, shuffle=False,
                        frame_spec=(510, 128, 64))
    blk = lambda L: -(-((L + 382) // 128 + 1) // 64)
    for i in range(len(ds)):
        L = ds[i][0].shape[-1]
        assert bl.bucket_of(L) >= L
        assert blk(bl.bucket_of(L)) == blk(L)
    for mix, tgt in bl:
        assert mix.shape[0] == 2
        # padded length sits exactly at a block boundary
        assert (mix.shape[-1] + 382) // 128 + 1 == blk(mix.shape[-1]) * 64


def test_max_collator_left_align():
    """align='left' puts all padding at the end (the layout the score
    model's own %64 frame pad produces), so eval slices are [0:L]."""
    items = [(np.ones((1, 10), np.float32), np.ones((2, 10), np.float32)),
             (np.ones((1, 6), np.float32), np.ones((2, 6), np.float32))]
    mix, tgt = max_collator(items, pad_to=12, align="left")
    assert mix.shape == (2, 1, 12) and tgt.shape == (2, 2, 12)
    assert mix[1, 0, :6].all() and not mix[1, 0, 6:].any()
    assert tgt[0, :, :10].all() and not tgt[0, :, 10:].any()


def test_evaluate_dataset_end_to_end(tmp_path):
    """Oracle separator (returns the true sources) must score near-perfect
    and produce reference-schema JSON artifacts."""
    ds = SyntheticMixDataset(n_items=6, min_len_s=1.0, max_len_s=2.0)

    targets = {i: ds[i][1] for i in range(len(ds))}

    def separate_fn(key, mix):
        # cheat: look up targets by matching batch content on host
        # (eval collation is left-aligned: padding is all trailing)
        out = []
        mix_np = np.asarray(mix)
        for b in range(mix_np.shape[0]):
            found = None
            for i, tgt in targets.items():
                t = tgt.shape[-1]
                T = mix_np.shape[-1]
                pad = T - t
                if pad < 0:
                    continue
                padded = np.pad(tgt.sum(0), (0, pad))
                if np.allclose(padded, mix_np[b, 0], atol=1e-5):
                    found = np.pad(tgt, ((0, 0), (0, pad)))
                    break
            out.append(found)
        return jnp.asarray(np.stack(out))

    res = evaluate_dataset(
        separate_fn, ds, fs=8000, batch_size=2, bucket_multiple=4096,
        out_dir=str(tmp_path), split_name="synthetic_test",
        save_samples=2, save_figures=1)
    assert res["summary"]["number"] == 6
    assert res["summary"]["si_sdr"] > 40
    # media dumps (reference: evaluate_mp.py save_fig/save_samples)
    media = tmp_path / "synthetic_test_media"
    assert (media / "0000.enh0.wav").exists()
    assert (media / "0001.enh1.wav").exists()
    assert (media / "0000.pdf").exists()
    j = json.load(open(tmp_path / "synthetic_test_summary.json"))
    assert set(j) == {"batch_idx", "si_sdr", "si_sir", "si_sar", "pesq",
                      "stoi", "nfe", "runtime", "len_s", "number",
                      "pesq_impl", "merged_utterances"}
    assert j["merged_utterances"] == 0
    per = json.load(open(tmp_path / "synthetic_test.json"))
    assert len(per) == 6
    assert "runtime" in per["0"]


def test_evaluate_cli_no_proc_mixture_baseline(tmp_path):
    """--no-proc scores the unprocessed mixture with nfe 0, like the
    reference's __no_proc__ checkpoint sentinel
    (reference: evaluate_mp.py:223,303-308)."""
    import json

    from ditsep_tpu.cli.evaluate import main

    main(["--config", "diffsep", "--synthetic", "--limit", "2",
          "--eval-batch-size", "2", "--no-proc", "--cpu",
          "--synthetic-len-s", "1.0", "--out-dir", str(tmp_path)])
    summaries = list(tmp_path.glob("*_summary.json"))
    assert summaries
    s = json.loads(summaries[0].read_text())
    assert s["nfe"] == 0
    assert abs(s["si_sdr"]) < 3.0  # mixture baseline, not separation


def test_prepare_audio_inference_utils():
    """Resample + pad/crop + channel fitting for inference inputs
    (reference: inference/utils.py:5-40)."""
    import numpy as np

    from ditsep_tpu.inference.utils import prepare_audio, set_audio_channels

    x = np.random.default_rng(0).normal(size=16000).astype(np.float32)
    out = prepare_audio(x, 16000, 8000, 4000, 2)
    assert out.shape == (1, 2, 4000)
    np.testing.assert_allclose(out[0, 0], out[0, 1])  # mono duplicated

    y = np.random.default_rng(1).normal(size=(3, 8000)).astype(np.float32)
    out2 = prepare_audio(y, 8000, 8000, 10000, 1)
    assert out2.shape == (1, 1, 10000)
    assert float(np.abs(out2[..., 9000:]).max()) == 0.0  # zero-padded
    np.testing.assert_allclose(out2[0, 0, :8000], y.mean(0), atol=1e-6)

    z = np.random.default_rng(2).normal(size=(2, 5, 100))
    assert set_audio_channels(z, 2).shape == (2, 2, 100)


# -------------------------------------------------------- VCTK-DEMAND -----
def _make_valentini(tmp_path, layout="valentini", n_train=6, n_test=2,
                    fs=16000):
    from ditsep_tpu.data import write_wav as _ww
    rng = np.random.default_rng(0)
    if layout == "valentini":
        dirs = {("train", "noisy"): tmp_path / "noisy_trainset_wav",
                ("train", "clean"): tmp_path / "clean_trainset_wav",
                ("test", "noisy"): tmp_path / "noisy_testset_wav",
                ("test", "clean"): tmp_path / "clean_testset_wav"}
    else:  # the reference's preprocessed layout ({split}/{noisy,clean})
        dirs = {(s, k): tmp_path / s / k
                for s in ("train", "test") for k in ("noisy", "clean")}
    for d in dirs.values():
        d.mkdir(parents=True, exist_ok=True)
    for part, n in (("train", n_train), ("test", n_test)):
        for i in range(n):
            t = int(rng.integers(fs // 2, fs * 2))
            clean = (rng.normal(size=t) * 0.1).astype(np.float32)
            noise = (rng.normal(size=t) * 0.05).astype(np.float32)
            _ww(str(dirs[(part, "clean")] / f"p{i}.wav"), clean, fs)
            _ww(str(dirs[(part, "noisy")] / f"p{i}.wav"), clean + noise, fs)
    return tmp_path


@pytest.mark.parametrize("layout", ["valentini", "reference"])
def test_noisy_dataset_shapes_and_consistency(tmp_path, layout):
    from ditsep_tpu.data import NoisyDataset
    root = _make_valentini(tmp_path, layout=layout)
    fs = 16000
    ds = NoisyDataset(path=str(root), split="train", fs=fs, len_s=1.0)
    assert len(ds) > 0
    noisy, tgt = ds[0]
    # tiled/cropped to len_s; targets are [clean, noise] with
    # clean + noise == noisy exactly (noise defined as the residual)
    assert noisy.shape == (1, fs) and tgt.shape == (2, fs)
    np.testing.assert_allclose(tgt.sum(0), noisy[0], atol=1e-6)
    # test split keeps native lengths (reference: vctk_demand.py:59-61)
    dt = NoisyDataset(path=str(root), split="test", fs=fs, len_s=None)
    assert len(dt) == 2
    nt, tt = dt[0]
    assert nt.shape[-1] not in (0, fs) and tt.shape == (2, nt.shape[-1])


def test_noisy_dataset_train_val_split_disjoint(tmp_path):
    from ditsep_tpu.data import NoisyDataset
    root = _make_valentini(tmp_path, n_train=10)
    tr = NoisyDataset(path=str(root), split="train", len_s=None)
    va = NoisyDataset(path=str(root), split="val", len_s=None)
    assert len(va) == 1 and len(tr) == 9  # 10% holdout
    assert not set(tr.files) & set(va.files)
    assert sorted(set(tr.files) | set(va.files)) == sorted(
        f"p{i}.wav" for i in range(10))
    # deterministic across constructions
    va2 = NoisyDataset(path=str(root), split="val", len_s=None)
    assert va.files == va2.files


def test_noisy_dataset_small_corpus_still_has_val(tmp_path):
    """Below 1/val_fraction files int() would truncate the holdout to
    zero; at least one val file must exist whenever any do."""
    from ditsep_tpu.data import NoisyDataset
    root = _make_valentini(tmp_path, n_train=5)
    va = NoisyDataset(path=str(root), split="val", len_s=None)
    tr = NoisyDataset(path=str(root), split="train", len_s=None)
    assert len(va) == 1 and len(tr) == 4
    assert not set(tr.files) & set(va.files)


def test_item_length_header_probe(tmp_path):
    """item_length must match the decoded length without decoding
    (wav header probe for file datasets, rng-replay for synthetic)."""
    from ditsep_tpu.data import NoisyDataset, SyntheticMixDataset
    from ditsep_tpu.data.wsj0_mix import wav_num_samples, write_wav

    x = np.random.default_rng(0).normal(size=12345).astype(np.float32)
    p = str(tmp_path / "probe.wav")
    write_wav(p, x, 8000)
    assert wav_num_samples(p) == 12345

    ds = SyntheticMixDataset(n_items=4)
    for i in range(4):
        assert ds.item_length(i) == ds[i][0].shape[-1]

    root = _make_valentini(tmp_path / "valentini", n_train=4)
    nd = NoisyDataset(path=str(root), split="test", len_s=None)
    for i in range(len(nd)):
        assert nd.item_length(i) == nd[i][0].shape[-1]
    ndc = NoisyDataset(path=str(root), split="train", len_s=0.5)
    assert ndc.item_length(0) == ndc[0][0].shape[-1] == 8000


def test_native_collate_matches_numpy():
    """The C collate path (native/ditsep_io.cpp) must produce exactly
    the numpy collation for centered float32 batches, and stay off for
    non-eligible fields (left-align, non-f32)."""
    from ditsep_tpu import native
    from ditsep_tpu.data.wsj0_mix import _native_collate_center

    rng = np.random.default_rng(0)
    batch = [(rng.standard_normal((1, t)).astype(np.float32),
              rng.standard_normal((2, t)).astype(np.float32))
             for t in (100, 73, 58)]
    mix, tgt = max_collator(batch)  # native path when lib present

    def numpy_ref(i):
        arrs = []
        for b in batch:
            pad = 100 - b[i].shape[-1]
            lo = pad // 2
            arrs.append(np.pad(b[i], [(0, 0), (lo, pad - lo)]))
        return np.stack(arrs)

    np.testing.assert_array_equal(mix, numpy_ref(0))
    np.testing.assert_array_equal(tgt, numpy_ref(1))
    if native.available():
        assert _native_collate_center([b[0] for b in batch], 100) \
            is not None
    # 3-D / non-f32 fields fall back to numpy
    assert _native_collate_center([np.zeros((1, 2, 3), np.float32)],
                                  4) is None
    assert _native_collate_center([np.zeros((1, 3), np.float64)],
                                  4) is None


def test_merge_dnsmos_summary_and_index_parse(tmp_path):
    """DNSMOS merge: last-digit-run filename indexing (not the first),
    per-utterance columns joined, and the summary JSON's means
    refreshed to include the new fields (reference:
    src/evaluate/merge_dnsmos.py:12-160)."""
    from ditsep_tpu.eval.dnsmos import merge_dnsmos

    results = {"1": {"si_sdr": [7.0, 8.0]}, "2": {"si_sdr": [5.0, 6.0]}}
    rp = tmp_path / "test.json"
    rp.write_text(json.dumps(results))
    (tmp_path / "test_summary.json").write_text(
        json.dumps({"si_sdr": 0.0, "number": 0}))
    csv_p = tmp_path / "dnsmos.csv"
    csv_p.write_text(
        "filename,OVRL,SIG,BAK\n"
        "0001.enh0.wav,3.0,3.2,3.4\n"   # harness naming: idx 1, stem-
        "0001.enh1.wav,3.2,3.4,3.6\n"   # trailing enh digit ignored
        "0002.enh0.wav,2.0,2.2,2.4\n"
        "0099.enh0.wav,9.9,9.9,9.9\n")  # no such utterance
    with pytest.warns(UserWarning, match="matched no utterance"):
        merged = merge_dnsmos(str(rp), str(csv_p))
    assert merged["1"]["dnsmos_ovrl"] == [3.0, 3.2]
    assert merged["2"]["dnsmos_ovrl"] == [2.0]
    summary = json.loads((tmp_path / "test_summary.json").read_text())
    assert summary["number"] == 2
    assert abs(summary["si_sdr"] - 6.5) < 1e-9
    assert abs(summary["dnsmos_ovrl"] - (3.1 + 2.0) / 2) < 1e-9
    # foreign naming handled via an explicit pattern
    csv2 = tmp_path / "dnsmos2.csv"
    csv2.write_text("filename,OVRL,SIG,BAK\n"
                    "fs8000_0002.enh0.wav,4.0,4.0,4.0\n")
    merged2 = merge_dnsmos(str(rp), str(csv2),
                           filename_index_re=r"_(\d+)\.")
    assert merged2["2"]["dnsmos_ovrl"] == [4.0]


def test_wss_narrow_bands_weighted_up():
    """The critical-band gain must be bw_min/bw_i (reference:
    evaluate_covl.py:243): narrow low bands get the largest filter
    peaks. The inverted form boosted WIDE bands by (bw_i/bw_0)^2."""
    from ditsep_tpu.eval.composite import _BANDWIDTH, wss

    rng = np.random.default_rng(0)
    x = rng.standard_normal(16000 * 2) * 0.1
    # identical signals -> zero distance regardless of normalization;
    # perturbed high band -> finite distance (behavioral smoke)
    assert float(np.mean(wss(x, x, 16000))) < 1e-9
    y = x + 0.05 * np.sin(2 * np.pi * 6000 *
                          np.arange(x.size) / 16000)
    assert float(np.mean(wss(x, y, 16000))) > 0
    # direct check of the documented gain ratio on the filter bank
    import ditsep_tpu.eval.composite as comp
    src = open(comp.__file__).read()
    assert "np.log(_BANDWIDTH[0]) - np.log(bw[i])" in src


def test_latent_cache_stores_crop_consistent_targets(tmp_path):
    """The cache stores the exact target crop encoded into each latent:
    random-cropping datasets re-draw per access, so pairing latents with
    fresh reads would supervise the decoder with a DIFFERENT crop. Also:
    n_samples_per_item>1 cache indices must map back to the right
    source item."""
    from ditsep_tpu.data import LatentDataset

    rng = np.random.default_rng(0)
    tgts = [rng.standard_normal((2, 50)).astype(np.float32)
            for _ in range(3)]

    class FlakyDataset:
        """Returns DIFFERENT data on every access (worst-case crop)."""
        def __len__(self):
            return 3

        def __getitem__(self, i):
            return np.zeros((1, 50), np.float32), \
                rng.standard_normal((2, 50)).astype(np.float32)

    # two cache entries per item (n_samples_per_item=2 layout)
    for i in range(3):
        for s in range(2):
            save_latent_cache(str(tmp_path), i * 2 + s,
                              np.full((2, 4, 5), i, np.float32),
                              targets=tgts[i])
    save_latent_metadata(str(tmp_path), range(6),
                         extra={"base_indices": [0, 0, 1, 1, 2, 2]})
    lds = LatentDataset(str(tmp_path), FlakyDataset())
    assert len(lds) == 6
    for j in range(6):
        tgt, lat = lds[j]
        np.testing.assert_array_equal(tgt, tgts[j // 2])  # stored crop
        assert float(lat[0, 0, 0]) == j // 2  # right item's latent
