"""End-to-end CLI smoke tests on synthetic data (tiny models)."""
import json
import os

import numpy as np
import pytest

# heavyweight end-to-end tests: deselect with -m 'not slow' for quick
# iteration (the full suite still runs them)
pytestmark = pytest.mark.slow

TINY_WAVEFORM = [
    "model.score_model.nf=16",
    "model.score_model.ch_mult=(1, 1)",
    "model.score_model.attn_resolutions=()",
    "model.sampler.N=2",
]
TINY_LATENT = [
    "model.score_model.nf=16",
    "model.score_model.ch_mult=(1, 2)",
    "model.score_model.attn_resolutions=()",
    "model.score_model.image_size=4",
    "model.vae.channels=8",
    "model.vae.c_mults=(1, 2)",
    "model.vae.strides=(2, 4)",
    "model.vae.latent_dim=4",
    "model.sampler.N=2",
]


def test_train_diffsep_cli(tmp_path):
    from ditsep_tpu.cli.train_diffsep import main
    wd = str(tmp_path / "run")
    main(["--config", "diffsep", "--synthetic", "--workdir", wd,
          "--synthetic-len-s", "2", "--batch-size", "2",
          "--max-steps", "3", "--max-epochs", "2",
          "--override", *TINY_WAVEFORM])
    assert os.path.exists(f"{wd}/metrics.jsonl")
    lines = [json.loads(l) for l in open(f"{wd}/metrics.jsonl")]
    assert any("val/si_sdr" in l for l in lines)
    assert os.path.exists(f"{wd}/checkpoints/best-model")


def test_train_diffsep_cli_demo_and_resume(tmp_path):
    """--demo-every logs demo separations mid-run (the reference's
    LDMDemoCallback capability, src/ldm.py:630-726, surfaced on the
    diffsep CLI) and --resume continues from the rolling latest
    checkpoint (reference: src/train_diffsep.py:174-180)."""
    import glob

    from ditsep_tpu.cli.train_diffsep import main
    wd = str(tmp_path / "run")
    base = ["--config", "diffsep", "--synthetic", "--workdir", wd,
            "--synthetic-len-s", "2", "--batch-size", "2",
            "--max-epochs", "4",
            "--override", *TINY_WAVEFORM]
    main(base + ["--max-steps", "2", "--demo-every", "2"])
    # demo artifact: audio summaries in the tensorboard event stream
    evs = glob.glob(f"{wd}/tb/events*")
    assert evs, os.listdir(wd)
    blob = b"".join(open(f, "rb").read() for f in evs)
    assert b"demo/est_0" in blob and b"demo/mix" in blob
    assert json.load(
        open(f"{wd}/checkpoints/latest/step.json"))["step"] == 2
    # kill/resume: a fresh process continues from the latest checkpoint
    main(base + ["--max-steps", "4", "--resume"])
    assert json.load(
        open(f"{wd}/checkpoints/latest/step.json"))["step"] == 4


def test_train_ldm_cli_demo_and_resume(tmp_path):
    """train_ldm --demo-every decodes the demo latents through the live
    decoder mid-run; --resume continues the step counter from the
    latest checkpoint."""
    import glob

    from ditsep_tpu.cli.cache_latents import main as cache_main
    from ditsep_tpu.cli.train_ldm import main as ldm_main
    cache_dir = str(tmp_path / "cache")
    wd = str(tmp_path / "run")
    cache_main(["--synthetic", "--out-dir", cache_dir, "--sampler-N", "2",
                "--override", *TINY_LATENT])
    base = ["--synthetic", "--workdir", wd, "--latent-cache", cache_dir,
            "--batch-size", "2", "--override", *TINY_LATENT,
            "training.loss.spectral.fft_sizes=(256, 128)",
            "training.loss.spectral.hop_sizes=(64, 32)",
            "training.loss.spectral.perceptual_weighting=False"]
    ldm_main(base + ["--max-steps", "2", "--demo-every", "2"])
    evs = glob.glob(f"{wd}/tb/events*")
    blob = b"".join(open(f, "rb").read() for f in evs)
    assert b"demo/est_0" in blob and b"demo/target_0" in blob
    ldm_main(base + ["--max-steps", "4", "--resume"])
    # resumed run continued the step counter: a step-4 checkpoint exists
    assert any("step-00000004" in n
               for n in os.listdir(f"{wd}/checkpoints")), \
        os.listdir(f"{wd}/checkpoints")


def test_train_diffsep_latent_cli(tmp_path):
    from ditsep_tpu.cli.train_diffsep_latent import main
    wd = str(tmp_path / "run")
    main(["--synthetic", "--synthetic-len-s", "2", "--workdir", wd,
          "--batch-size", "2",
          "--max-steps", "2", "--max-epochs", "1",
          "--override", *TINY_LATENT])
    assert os.path.exists(f"{wd}/metrics.jsonl")


def test_cache_latents_and_train_ldm_cli(tmp_path):
    from ditsep_tpu.cli.cache_latents import main as cache_main
    from ditsep_tpu.cli.train_ldm import main as ldm_main
    cache_dir = str(tmp_path / "cache")
    cache_main(["--synthetic", "--out-dir", cache_dir, "--sampler-N", "2",
                "--override", *TINY_LATENT])
    assert os.path.exists(f"{cache_dir}/metadata.npz")
    wd = str(tmp_path / "ldm")
    ldm_main(["--synthetic", "--workdir", wd, "--latent-cache", cache_dir,
              "--batch-size", "2", "--max-steps", "3",
              "--override", *TINY_LATENT,
              "training.loss.spectral.fft_sizes=(256, 128)",
              "training.loss.spectral.hop_sizes=(64, 32)",
              "training.loss.spectral.perceptual_weighting=False"])
    assert os.path.exists(f"{wd}/metrics.jsonl")


def test_evaluate_cli(tmp_path, capsys):
    from ditsep_tpu.cli.evaluate import main
    out = str(tmp_path / "results")
    main(["--config", "diffsep", "--synthetic", "--out-dir", out,
          "--sampler-N", "2", "--limit", "2", "--eval-batch-size", "2",
          "--override", *TINY_WAVEFORM])
    summary = json.load(open(f"{out}/librimix_test_summary.json"))
    assert summary["number"] == 2
    assert summary["nfe"] == 4


def test_evaluate_cli_ab2(tmp_path):
    """--sampler ab2: one score eval per step -> nfe == N (the opt-in
    reduced-NFE path studied in docs/nfe_study.json)."""
    from ditsep_tpu.cli.evaluate import main
    out = str(tmp_path / "results")
    main(["--config", "diffsep", "--synthetic", "--out-dir", out,
          "--sampler", "ab2", "--sampler-N", "3", "--limit", "2",
          "--eval-batch-size", "2", "--synthetic-len-s", "0.5",
          "--override", *TINY_WAVEFORM])
    summary = json.load(open(f"{out}/librimix_test_summary.json"))
    assert summary["number"] == 2
    assert summary["nfe"] == 3
    assert np.isfinite(summary["si_sdr"])


def test_evaluate_cli_latent(tmp_path):
    """The evaluate_latent equivalent: encode -> latent PC sample ->
    decode -> metrics (reference: src/evaluate_latent.py)."""
    from ditsep_tpu.cli.evaluate import main
    out = str(tmp_path / "results")
    main(["--config", "latent_diffsep_ouve", "--synthetic", "--latent",
          "--out-dir", out, "--sampler-N", "2", "--limit", "2",
          "--eval-batch-size", "2", "--synthetic-len-s", "0.5",
          "--override", *TINY_LATENT])
    summary = json.load(open(f"{out}/librimix_test_summary.json"))
    assert summary["number"] == 2
    assert np.isfinite(summary["si_sdr"])


def test_evaluate_cli_mesh(tmp_path):
    """The north-star config-5 path: sharded batched eval over the
    8-virtual-device mesh (reference schema, src/evaluate_mp.py:398-529).
    The batch axis (8) shards one utterance per device."""
    import jax
    from ditsep_tpu.cli.evaluate import main
    assert len(jax.devices()) == 8  # conftest provisions the virtual mesh
    out = str(tmp_path / "results")
    # fixed short utterances -> ONE small bucket shape -> one compiled
    # sampler program and a small execution (compile-bound 1-vCPU box)
    # eval-batch-size 4 on 8 devices: the harness must round the static
    # batch up to the device count (VERDICT r2 item 3a regression)
    main(["--config", "diffsep", "--synthetic", "--out-dir", out,
          "--mesh", "--sampler-N", "2", "--limit", "8",
          "--eval-batch-size", "4", "--synthetic-len-s", "0.5",
          "--bucket-multiple", "4096", "--no-warmup",
          "--override", *TINY_WAVEFORM])
    summary = json.load(open(f"{out}/librimix_test_summary.json"))
    assert summary["number"] == 8
    assert summary["nfe"] == 4
    assert np.isfinite(summary["pesq"])
    per = json.load(open(f"{out}/librimix_test.json"))
    assert len(per) == 8


def test_facodec_demo_cli(tmp_path):
    """FACodec reconstruction demo (reference:
    scripts/facodec_inference.py): encode -> FVQ -> decode round trip,
    wav + code dumps (random weights: pipeline check)."""
    from ditsep_tpu.cli.facodec_demo import main
    from ditsep_tpu.data import write_wav
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    write_wav(str(in_dir / "a.wav"),
              rng.standard_normal(3210).astype(np.float32) * 0.3, 16000)
    out_dir = str(tmp_path / "out")
    main(["--in-dir", str(in_dir), "--out-dir", out_dir])
    from ditsep_tpu.data.wsj0_mix import read_wav
    rec, fs = read_wav(f"{out_dir}/a_reconstructed.wav")
    assert fs == 16000 and np.asarray(rec).reshape(-1).shape[0] == 3210
    codes = np.load(f"{out_dir}/a_codes.npy")
    # default grouped depth: 1 prosody + 2 content + 3 residual
    assert codes.shape[-1] == 6 and codes.dtype.kind in "iu"


def test_separate_cli(tmp_path):
    from ditsep_tpu.cli.separate import main
    from ditsep_tpu.data import write_wav
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(in_dir / f"u{i}.wav"),
                  rng.standard_normal(8000).astype(np.float32) * 0.3, 8000)
    out_dir = str(tmp_path / "out")
    main(["--config", "diffsep", "--input", str(in_dir), "--output",
          out_dir, "--sampler-N", "2", "--override", *TINY_WAVEFORM])
    assert sorted(os.listdir(f"{out_dir}/s0")) == ["u0.wav", "u1.wav"]
    assert sorted(os.listdir(f"{out_dir}/s1")) == ["u0.wav", "u1.wav"]


def test_separate_cli_chunked(tmp_path):
    """Long-form mode: files longer than the window are separated in
    fixed chunks with alignment + crossfade (inference/longform.py)."""
    from ditsep_tpu.cli.separate import main
    from ditsep_tpu.data import read_wav, write_wav
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.default_rng(1)
    write_wav(str(in_dir / "long.wav"),
              rng.standard_normal(12000).astype(np.float32) * 0.3, 8000)
    out_dir = str(tmp_path / "out")
    main(["--config", "diffsep", "--input", str(in_dir), "--output",
          out_dir, "--sampler-N", "2", "--chunk-seconds", "0.5",
          "--overlap-seconds", "0.1", "--override", *TINY_WAVEFORM])
    est, fs = read_wav(f"{out_dir}/s0/long.wav")
    assert fs == 8000 and est.shape[-1] == 12000
    assert np.isfinite(est).all()


def test_separate_cli_streaming(tmp_path):
    """Bounded-latency streaming mode: the same file flows through
    serving.StreamingSeparator in small blocks (real-time path)."""
    from ditsep_tpu.cli.separate import main
    from ditsep_tpu.data import read_wav, write_wav
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    rng = np.random.default_rng(2)
    write_wav(str(in_dir / "stream.wav"),
              rng.standard_normal(12000).astype(np.float32) * 0.3, 8000)
    out_dir = str(tmp_path / "out")
    main(["--config", "diffsep", "--input", str(in_dir), "--output",
          out_dir, "--sampler-N", "2", "--chunk-seconds", "0.5",
          "--overlap-seconds", "0.1", "--streaming-block-seconds", "0.2",
          "--override", *TINY_WAVEFORM])
    est, fs = read_wav(f"{out_dir}/s0/stream.wav")
    assert fs == 8000 and est.shape[-1] == 12000
    assert np.isfinite(est).all()


def test_model_info_cli(capsys):
    """Parameter-inventory probe (reference: scripts/vae_print.py,
    facodec_print.py, debug.py) -- eval_shape only, so even the flagship
    config is cheap to inspect."""
    from ditsep_tpu.cli.model_info import main
    main(["--config", "diffsep", "--override", *TINY_WAVEFORM])
    out = capsys.readouterr().out
    assert "ScoreModelNCSNpp" in out and "parameters" in out
    assert "sde: MixSDE" in out
    main(["--facodec", "--length", "1000"])
    out = capsys.readouterr().out
    assert "FACodecEncoder" in out and "FACodecDecoder" in out


def test_train_enhancement_cli(tmp_path):
    """Noise-reduction family e2e on a fake Valentini layout: NoisyDataset
    train/val holdout -> PriorMixSDE + init_hack 4 training -> checkpoint."""
    from ditsep_tpu.cli.train_diffsep import main
    from ditsep_tpu.data import write_wav
    rng = np.random.default_rng(0)
    root = tmp_path / "valentini"
    for part, n in (("train", 10), ("test", 2)):
        nd = root / f"noisy_{part}set_wav"
        cd = root / f"clean_{part}set_wav"
        nd.mkdir(parents=True), cd.mkdir(parents=True)
        for i in range(n):
            t = int(rng.integers(4000, 8000))
            clean = (rng.normal(size=t) * 0.1).astype(np.float32)
            noise = (rng.normal(size=t) * 0.05).astype(np.float32)
            write_wav(str(cd / f"p{i}.wav"), clean, 16000)
            write_wav(str(nd / f"p{i}.wav"), clean + noise, 16000)
    wd = str(tmp_path / "run")
    main(["--config", "enhancement", "--data-path", str(root),
          "--workdir", wd, "--batch-size", "2", "--max-steps", "2",
          "--max-epochs", "1",
          "--override", *TINY_WAVEFORM, "datamodule.max_len_s=0.25"])
    assert os.path.exists(f"{wd}/checkpoints/best-model")
