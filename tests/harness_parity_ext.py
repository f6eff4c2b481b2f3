"""Harness-parity extension (VERDICT r4 item 3): artifact-level parity
for the reference's OTHER two evaluator executables.

* ``evaluate_ouve.py`` — the DiffSepOU family. A near-copy of
  evaluate_mp.py whose functional diffs are the model class
  (reference: src/evaluate_ouve.py:257 ``DiffSepOU(model_config)``,
  src/diffsep.py:729-827) and the corrector name
  (src/evaluate_ouve.py:315 ``"ald"`` vs evaluate_mp's ``"ald2"``).
  OUVESDE.prior_sampling draws with ``torch.randn``
  (src/sdes/sdes.py:687-696) — unlike MixSDE's ``randn_like`` — so the
  noise interception patches both.

* ``evaluate_latent.py`` — the LatentDiffSep (thesis) family:
  VAE-encode -> latent PC ("ald") -> VAE-decode before metrics
  (src/evaluate_latent.py:259-281). The VAE is the spec-faithful
  ``_TorchOobleck`` oracle from test_oobleck wrapped with the
  stable-audio-tools AudioAutoencoder surface LatentDiffSep touches
  (``encode(x, iterate_batch=False)`` sampling the VAE bottleneck per
  src/stable_audio_tools/models/bottleneck.py:71-83,
  ``decode``, ``encoder.hop_length``) — the real
  ``utils.load_stable_model`` pulls stable_audio_tools wholesale
  (alias_free_torch etc., uninstallable here), so it is stubbed to
  return the oracle twin; everything downstream of it
  (LatentDiffSep itself, utils.pad, sdes, the latent score model,
  evaluate_process, summarize) is the reference's own code.

Both legs run the reference executable end to end on torch CPU over a
synthetic LibriMix-layout set and diff the per-utterance result JSON
against our ``eval.evaluate_dataset`` with imported weights and matched
noise, exactly like the evaluate_mp leg in harness_parity_lib.

Noise-activation detail: NCSNpp construction itself consumes
``torch.randn`` (GaussianFourierProjection,
src/models/diffsep/ncsnpp_utils/layerspp.py:42; variance_scaling,
layers.py:88), so the queue patch must NOT be active during model
construction. ``evaluate_process`` calls ``model.eval(no_ema=True)``
right between checkpoint load and the sampling loop — the queue is
armed by hooking that method on the model class.

Latent-leg length note: the reference's ``utils.pad``
(src/utils/torch_utils.py:12-18) pads a FULL extra hop when the length
is already a multiple; ours is a documented no-op in that case
(ditsep_tpu/utils/separate.py:98-108). The synthetic latent set
therefore uses lengths that are NOT hop multiples, where both
definitions agree.
"""
from __future__ import annotations

import importlib
import io
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np

import harness_parity_lib as lib

FS = lib.FS
N_STEPS = lib.N_STEPS
SNR = lib.SNR
T_EPS = lib.T_EPS
CS = lib.CORRECTOR_STEPS

# ----------------------------------------------------------------- OUVE --
OUVE_SDE = dict(theta=1.5, sigma_min=0.05, sigma_max=0.5)


def model_config_ouve():
    cfg = lib.model_config_dict()
    cfg["model"]["sde"] = {"_target_": "sdes.sdes.OUVESDE",
                           **OUVE_SDE, "N": N_STEPS}
    return cfg


class _NoiseQueue:
    """Pops pre-generated draws for torch.randn / torch.randn_like in
    strict order with shape assertions; armed only after model
    construction (see module docstring)."""

    def __init__(self, items):
        self.items = list(items)
        self.armed = False

    def push_utterances(self, noise_per_utt, with_enc=False):
        for nz in noise_per_utt:
            if with_enc:
                self.items.append(nz["enc_mix"])
                self.items.append(nz["enc_tgt"])
            self.items.append(nz["prior"])
            for s in range(N_STEPS):
                self.items.append(nz["corr"][s, 0])
                self.items.append(nz["pred"][s])

    def pop(self, shape, dtype):
        import torch

        z = torch.from_numpy(self.items.pop(0)).to(dtype)
        assert z.shape == torch.Size(shape), (z.shape, tuple(shape))
        return z

    def install(self):
        import torch

        self._orig = (torch.randn, torch.randn_like)
        q = self

        def fake_randn(*a, **k):
            if not q.armed:
                return q._orig[0](*a, **k)
            # torch.randn accepts randn(2, 3) or randn((2, 3)) /
            # randn(torch.Size(...)); prior_sampling uses the latter
            # (src/sdes/sdes.py:695)
            shape = (tuple(a[0]) if len(a) == 1 and hasattr(a[0], "__len__")
                     else a)
            return q.pop(shape, k.get("dtype") or torch.float32)

        def fake_randn_like(x, *a, **k):
            if not q.armed:
                return q._orig[1](x, *a, **k)
            return q.pop(x.shape, x.dtype)

        torch.randn = fake_randn
        torch.randn_like = fake_randn_like

    def restore(self):
        import torch

        torch.randn, torch.randn_like = self._orig


def _arm_on_eval(model_cls, queue):
    """Patch model_cls.eval to arm the queue — evaluate_process calls it
    exactly once, after construction + load_state_dict and before
    sampling (src/evaluate_ouve.py:266, src/evaluate_latent.py:209)."""
    orig_eval = model_cls.eval

    def eval_hook(self, no_ema=False):
        queue.armed = True
        return orig_eval(self, no_ema=no_ema)

    model_cls.eval = eval_hook
    return lambda: setattr(model_cls, "eval", orig_eval)


def _noise_dicts(lens, lat=None, seed=123):
    """Per-utterance stochastic budgets. Waveform legs: prior (1,2,L) +
    per-step corrector/predictor. Latent legs additionally carry the two
    VAE posterior draws (mix then target encode order,
    src/diffsep_latent.py:108-118)."""
    rng = np.random.default_rng(seed)
    out = []
    for L in lens:
        if lat is None:
            shape = (1, 2, L)
            d = {}
        else:
            ld, hop = lat
            tl = -(-L // hop)  # both pads land on the next multiple
            shape = (1, 2, ld, tl)
            d = {"enc_mix": rng.standard_normal(
                     (1, ld, tl)).astype(np.float32),
                 "enc_tgt": rng.standard_normal(
                     (2, ld, tl)).astype(np.float32)}
        d["prior"] = rng.standard_normal(shape).astype(np.float32)
        d["corr"] = rng.standard_normal(
            (N_STEPS, CS) + shape).astype(np.float32)
        d["pred"] = rng.standard_normal(
            (N_STEPS,) + shape).astype(np.float32)
        out.append(d)
    return out


def run_reference_harness_ouve(data_dir, ckpt_path, out_dir,
                               noise_per_utt):
    """Drive evaluate_ouve's evaluate_process + summarize + the main()
    JSON aggregation (src/evaluate_ouve.py:212-354, 516-529)."""
    import json

    import torch
    import yaml

    lib.install_ref_eval_stubs()
    ev = importlib.import_module("evaluate_ouve")
    import diffsep as ref_diffsep

    hparams = {"config": {"datamodule": {"librimix_test": {"dataset": {
        "_target_": "datasets.WSJ0_mix", "path": str(data_dir),
        "n_spkr": 2, "fs": FS, "cut": "max", "split": "librimix_test",
    }}}}}
    real_open = open

    def fake_open(path, *a, **k):
        if str(path) == lib.REF_HPARAMS_PATH:
            return io.StringIO(yaml.safe_dump(hparams))
        return real_open(path, *a, **k)

    args = SimpleNamespace(
        ckpt=Path(ckpt_path), dl_workers=0, N=N_STEPS,
        corrector_steps=CS, snr=SNR, denoise=True,
        pesq_mode="nb", stoi_no_extended=False, schedule=None, save_n=0)

    queue = _NoiseQueue([])
    queue.push_utterances(noise_per_utt)
    queue.install()
    unhook = _arm_on_eval(ref_diffsep.DiffSepOU, queue)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ev.open = fake_open
    try:
        with torch.no_grad():
            split, results = ev.evaluate_process(
                args, out, "librimix_test", 0, len(lib.LENS), "cpu",
                model_config=sys.modules["omegaconf"].OmegaConf.create(
                    model_config_ouve()))
    finally:
        queue.restore()
        unhook()
        del ev.open
    assert not queue.items, f"{len(queue.items)} unconsumed ref draws"
    with open(out / f"{split}.json", "w") as f:
        json.dump(results, f, indent=2)
    summary = ev.summarize(results)
    with open(out / f"{split}_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return results, summary


def run_our_harness_ouve(data_dir, torch_state, out_dir, noise_per_utt):
    """Our real eval path with the OUVE trainer: DiffSepTrainer over
    OUVESDE dispatches the 'ald' corrector
    (ditsep_tpu/training/diffsep.py separate), the exact config
    cli/evaluate --config diffsep_ouve drives."""
    import jax
    import jax.numpy as jnp

    from ditsep_tpu.data.wsj0_mix import WSJ0Mix
    from ditsep_tpu.eval.evaluate import (_bucket_lengths_frames,
                                          evaluate_dataset)
    from ditsep_tpu.models import import_params
    from ditsep_tpu.models.score_models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import OUVESDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    ds = WSJ0Mix(path=data_dir, n_spkr=2, cut="max",
                 split="librimix_test", fs=FS)
    lengths = [ds.item_length(i) for i in range(len(ds))]
    assert lengths == lib.LENS, (lengths, lib.LENS)

    fm = ScoreModelNCSNpp(num_sources=2, n_fft=510, hop_length=128,
                          transform="exponent", spec_abs_exponent=0.5,
                          spec_factor=0.15, **lib.MODEL_KW)
    key = jax.random.PRNGKey(0)
    variables = fm.init(key, jnp.zeros((1, 2, lib.LENS[0])),
                        jnp.full((1,), 0.5),
                        jnp.zeros((1, 1, lib.LENS[0])))
    params = {"params": import_params(variables["params"], torch_state)}
    trainer = DiffSepTrainer(
        model=fm, sde=OUVESDE(**OUVE_SDE, N=N_STEPS),
        cfg=DiffSepConfig(n_speakers=2, t_eps=T_EPS))

    assigned, _ = _bucket_lengths_frames(lengths, (510, 128, 64), 24)
    assert all(assigned[i] == lengths[i] for i in range(len(lengths)))
    buckets = {}
    for i, L in enumerate(lengths):
        buckets.setdefault(assigned[i], []).append(i)
    order = [i for blen in sorted(buckets) for i in buckets[blen]]

    sep_jit = jax.jit(lambda p, k, mix, nz: trainer.separate(
        p, k, mix, N=N_STEPS, snr=SNR, corrector_steps=CS,
        noise=nz)[0])
    state = {"call": 0}

    def sep(key, mix):
        idx = order[state["call"]]
        state["call"] += 1
        nz = noise_per_utt[idx]
        tup = tuple(jnp.asarray(a) for a in
                    (nz["prior"], nz["corr"], nz["pred"]))
        return sep_jit(params, key, mix, tup)

    res = evaluate_dataset(
        sep, ds, fs=FS, batch_size=1, nfe=N_STEPS * (CS + 1),
        frame_spec=(510, 128, 64), max_buckets=24, out_dir=out_dir,
        split_name="librimix_test", warmup=False)
    assert state["call"] == len(lib.LENS)
    return res["results"], res["summary"]


# --------------------------------------------------------------- latent --
# tiny Oobleck from test_oobleck: CH=8, CM=(1,2), ST=(2,4) -> hop 8, LD=4
LAT_SDE = dict(theta=1.5, sigma_min=0.96, sigma_max=10.0)
LAT_KW = dict(nf=16, ch_mult=(1, 2), num_res_blocks=2,
              attn_resolutions=(2,), image_size=4, centered=True)
MAX_LATENT_LEN = 16
# NOT multiples of hop=8 (see module docstring); both pads -> 4096/8192
LENS_LAT = [4092] * 4 + [8190] * 4
BUCKET_MULT = 4096


def _twin_vae_cls():
    import torch
    from test_oobleck import _TorchOobleck

    class _StableVAETwin(_TorchOobleck):
        """The parity-tested torch Oobleck oracle wearing the
        stable-audio-tools AudioAutoencoder surface LatentDiffSep uses
        (src/diffsep_latent.py:41-55,108-128): encoder.hop_length,
        encode() sampling the VAE bottleneck (softplus(scale)+1e-4
        stdev, src/stable_audio_tools/models/bottleneck.py:71-83),
        decode()."""

        def __init__(self):
            super().__init__()
            self.encoder.hop_length = 8
            self.downsampling_ratio = 8

        def encode(self, audio, iterate_batch=False, **kw):
            h = self.encoder.layers(audio)
            mean, scale = h.chunk(2, dim=1)
            stdev = torch.nn.functional.softplus(scale) + 1e-4
            return mean + stdev * torch.randn_like(mean)

    return _StableVAETwin


def install_latent_stubs():
    """Everything evaluate_latent needs beyond install_ref_eval_stubs:
    utils.pad (the reference's real one) + the load_stable_model twin."""
    lib.install_ref_eval_stubs()
    import torch
    from test_full_pipeline_parity import _load_module_from_file

    u = sys.modules["utils"]
    if not hasattr(u, "pad"):
        tu = _load_module_from_file(
            "utils.torch_utils", lib.REF_SRC + "/utils/torch_utils.py")
        u.torch_utils = tu
        u.pad = tu.pad
    if not hasattr(u, "load_stable_model"):
        twin_cls = _twin_vae_cls()

        def load_stable_model(config_path, ckpt_path=None, verbose=False):
            torch.manual_seed(42)
            return twin_cls()

        u.load_stable_model = load_stable_model


def model_config_latent(data_dir):
    return {
        "model": {
            "score_model": {
                "_target_":
                    "models.diffsep.score_models.LatentScoreModelNCSNpp",
                "num_sources": 2, "max_latent_length": MAX_LATENT_LEN,
                "backbone_args": {
                    "_target_": "models.diffsep.ncsnpp.NCSNpp",
                    **{k: list(v) if isinstance(v, tuple) else v
                       for k, v in LAT_KW.items()}}},
            "vae": {"config_path": "__twin__", "ckpt_path": None,
                    "trainable_vae": False},
            "sde": {"_target_": "sdes.sdes.OUVESDE",
                    **LAT_SDE, "N": N_STEPS},
            "t_eps": T_EPS,
            "optimizer": {"lr": 1e-4},
            "loss": {"_target_": "torch.nn.MSELoss"},
            "val_losses": {},
            "sampler": {"N": N_STEPS, "snr": SNR,
                        "corrector_steps": CS, "denoise": True},
        },
        "datamodule": {"librimix_test": {"dataset": {
            "_target_": "datasets.WSJ0_mix", "path": str(data_dir),
            "n_spkr": 2, "fs": FS, "cut": "max",
            "split": "librimix_test"}}},
    }


def make_latent_checkpoint(ckpt_path):
    """Lightning-style checkpoint for LatentDiffSep.load_state_dict
    (strict=True: score_model.* + vae.* keys,
    src/evaluate_latent.py:203-204). Returns both bare states for the
    JAX importers."""
    import torch

    from models.diffsep.score_models import LatentScoreModelNCSNpp as TLSM

    twin_cls = _twin_vae_cls()
    torch.manual_seed(42)
    vae = twin_cls()
    torch.manual_seed(0)
    tlsm = TLSM(num_sources=2, max_latent_length=MAX_LATENT_LEN,
                backbone_args={"_target_": "models.diffsep.ncsnpp.NCSNpp",
                               **{k: list(v) if isinstance(v, tuple) else v
                                  for k, v in LAT_KW.items()}})
    tlsm.eval()
    vae.eval()
    state = {f"score_model.{k}": v for k, v in tlsm.state_dict().items()}
    state.update({f"vae.{k}": v for k, v in vae.state_dict().items()})
    torch.save({"state_dict": state}, ckpt_path)
    return (
        {k: v.detach().numpy() for k, v in tlsm.state_dict().items()},
        {k: v.detach().numpy() for k, v in vae.state_dict().items()
         if "parametrizations" not in k},
    )


def run_reference_harness_latent(data_dir, ckpt_path, out_dir,
                                 noise_per_utt):
    """Drive evaluate_latent's evaluate_process + summarize + main()'s
    aggregation (src/evaluate_latent.py:159-354). The model config is
    passed in whole (this evaluator reads datamodule from it rather than
    the hardcoded hparams path, src/evaluate_latent.py:180)."""
    import json

    import torch

    install_latent_stubs()
    ev = importlib.import_module("evaluate_latent")
    import diffsep_latent as ref_lat

    args = SimpleNamespace(
        ckpt=Path(ckpt_path), dl_workers=0, N=N_STEPS,
        corrector_steps=CS, snr=SNR, denoise=True,
        pesq_mode="nb", stoi_no_extended=False, schedule=None, save_n=0)

    queue = _NoiseQueue([])
    queue.push_utterances(noise_per_utt, with_enc=True)
    queue.install()
    unhook = _arm_on_eval(ref_lat.LatentDiffSep, queue)
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    try:
        with torch.no_grad():
            split, results = ev.evaluate_process(
                args, out, "librimix_test", 0, len(LENS_LAT), "cpu",
                model_config=sys.modules["omegaconf"].OmegaConf.create(
                    model_config_latent(data_dir)))
    finally:
        queue.restore()
        unhook()
    assert not queue.items, f"{len(queue.items)} unconsumed ref draws"
    with open(out / f"{split}.json", "w") as f:
        json.dump(results, f, indent=2)
    summary = ev.summarize(results)
    with open(out / f"{split}_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return results, summary


def run_our_harness_latent(data_dir, score_state, vae_state, out_dir,
                           noise_per_utt):
    """Our latent eval path: the exact separate_latent composition
    cli/evaluate --latent drives, through evaluate_dataset with
    sample-domain buckets (frame_spec=None, as the CLI wires for
    --latent)."""
    import jax
    import jax.numpy as jnp

    from ditsep_tpu.data.wsj0_mix import WSJ0Mix
    from ditsep_tpu.eval.evaluate import _bucket_lengths, evaluate_dataset
    from ditsep_tpu.models import import_params
    from ditsep_tpu.models.oobleck import OobleckVAE
    from ditsep_tpu.models.score_models import LatentScoreModelNCSNpp
    from ditsep_tpu.models.torch_import import import_oobleck_params
    from ditsep_tpu.sdes import OUVESDE
    from ditsep_tpu.training import DiffSepConfig
    from ditsep_tpu.training.diffsep_latent import LatentDiffSepTrainer

    ds = WSJ0Mix(path=data_dir, n_spkr=2, cut="max",
                 split="librimix_test", fs=FS)
    lengths = [ds.item_length(i) for i in range(len(ds))]
    assert lengths == LENS_LAT, (lengths, LENS_LAT)

    fvae = OobleckVAE(in_channels=1, out_channels=1, channels=8,
                      c_mults=(1, 2), strides=(2, 4), latent_dim=4)
    pad0 = -(-LENS_LAT[0] // 8) * 8
    vvars = fvae.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, pad0)))
    vae_params = {"params": import_oobleck_params(
        vvars["params"], vae_state, n_blocks=2)}

    flsm = LatentScoreModelNCSNpp(num_sources=2,
                                  max_latent_length=MAX_LATENT_LEN,
                                  **LAT_KW)
    tl0 = pad0 // 8
    svars = flsm.init(jax.random.PRNGKey(1), jnp.zeros((1, 2, 4, tl0)),
                      jnp.full((1,), 0.5), jnp.zeros((1, 1, 4, tl0)))
    params = {"params": import_params(svars["params"], score_state)}

    trainer = LatentDiffSepTrainer(
        model=flsm, sde=OUVESDE(**LAT_SDE, N=N_STEPS),
        cfg=DiffSepConfig(n_speakers=2, t_eps=T_EPS, sampler_N=N_STEPS,
                          sampler_snr=SNR, sampler_corrector_steps=CS),
        vae=fvae)

    assigned, _ = _bucket_lengths(lengths, BUCKET_MULT, 24)
    buckets = {}
    for i, L in enumerate(lengths):
        buckets.setdefault(assigned[i], []).append(i)
    order = [i for blen in sorted(buckets) for i in buckets[blen]]

    sep_jit = jax.jit(lambda p, vp, k, mix, ez, nz: trainer.separate_latent(
        p, vp, k, mix, target_dim=mix.shape[-1], N=N_STEPS,
        enc_noise=ez, noise=nz)[0])
    state = {"call": 0}

    def sep(key, mix):
        idx = order[state["call"]]
        state["call"] += 1
        nz = noise_per_utt[idx]
        tup = tuple(jnp.asarray(a) for a in
                    (nz["prior"], nz["corr"], nz["pred"]))
        return sep_jit(params, vae_params, key, mix,
                       jnp.asarray(nz["enc_mix"]), tup)

    res = evaluate_dataset(
        sep, ds, fs=FS, batch_size=1, nfe=N_STEPS * (CS + 1),
        frame_spec=None, bucket_multiple=BUCKET_MULT, max_buckets=24,
        out_dir=out_dir, split_name="librimix_test", warmup=False)
    assert state["call"] == len(LENS_LAT)
    return res["results"], res["summary"]


# ---------------------------------------------------------------- runs ---
def _leg_artifact(name, ref, ours, lens, extra_notes=()):
    ref_results, ref_summary = ref
    our_results, our_summary = ours
    deltas, exact = lib.diff_artifacts(ref_results, our_results)
    sdeltas = lib.diff_summaries(ref_summary, our_summary)
    return {
        "family": name,
        "config": {"n_utts": len(lens), "lens": lens, "fs": FS,
                   "N": N_STEPS, "snr": SNR, "corrector_steps": CS,
                   "noise": "matched (full stochastic budget shared)"},
        "per_utterance_max_abs_delta": deltas,
        "exact_fields": exact,
        "summary_abs_delta": sdeltas,
        "tolerances": lib.TOL,
        "pass": bool(all(deltas[f] <= lib.TOL[f] for f in lib.TOL)
                     and all(exact.values())),
        "reference_summary": ref_summary,
        "our_summary": our_summary,
        "notes": list(extra_notes),
    }


def run_ouve_parity(workdir: str):
    work = Path(workdir)
    data_dir = work / "data"
    ckpt = work / "epoch-024_si_sdr-0.000.ckpt"
    lib.write_synthetic_librimix(str(data_dir))
    lib.install_ref_eval_stubs()
    torch_state = lib.make_torch_checkpoint(str(ckpt))
    noise = _noise_dicts(lib.LENS, seed=123)
    ref = run_reference_harness_ouve(str(data_dir), str(ckpt),
                                     str(work / "ref_out"), noise)
    ours = run_our_harness_ouve(str(data_dir), torch_state,
                                str(work / "our_out"), noise)
    return _leg_artifact(
        "evaluate_ouve (DiffSepOU, OUVESDE, 'ald')", ref, ours, lib.LENS,
        ["reference side = the reference's own evaluate_ouve "
         "evaluate_process + summarize (src/evaluate_ouve.py:212-354,"
         "516-529) over its own DiffSepOU (src/diffsep.py:729-1127)",
         "same stub set + normalized-space metric note as the "
         "evaluate_mp leg (see harness_parity_lib docstring)"])


def run_latent_parity(workdir: str):
    work = Path(workdir)
    data_dir = work / "data_lat"
    ckpt = work / "latent_epoch-000.ckpt"
    _write_latent_set(str(data_dir))
    install_latent_stubs()
    score_state, vae_state = make_latent_checkpoint(str(ckpt))
    noise = _noise_dicts(LENS_LAT, lat=(4, 8), seed=321)
    ref = run_reference_harness_latent(str(data_dir), str(ckpt),
                                       str(work / "ref_out_lat"), noise)
    ours = run_our_harness_latent(str(data_dir), score_state, vae_state,
                                  str(work / "our_out_lat"), noise)
    return _leg_artifact(
        "evaluate_latent (LatentDiffSep: encode->latent PC->decode)",
        ref, ours, LENS_LAT,
        ["reference side = the reference's own evaluate_latent "
         "evaluate_process + summarize (src/evaluate_latent.py:159-354) "
         "over its own LatentDiffSep (src/diffsep_latent.py) with "
         "load_stable_model stubbed to the parity-tested _TorchOobleck "
         "oracle (real stable_audio_tools uninstallable here)",
         "no normalization on either side (the latent evaluator scores "
         "raw decoded waveforms, src/evaluate_latent.py:283-289)",
         "utterance lengths are non-multiples of the VAE hop so the "
         "reference's always-pad utils.pad and our pad-to-multiple "
         "agree (see module docstring)"])


def _write_latent_set(data_dir: str):
    """LibriMix-layout synthetic set with the latent-leg lengths."""
    from scipy.io import wavfile

    base = Path(data_dir) / "Libri2Mix" / "wav8k" / "max" / "test"
    for d in ("mix_clean", "s1", "s2"):
        (base / d).mkdir(parents=True, exist_ok=True)
    for i, L in enumerate(LENS_LAT):
        s1 = lib._speechlike(L, f0=110.0 + 13 * i, seed=500 + i)
        s2 = lib._speechlike(L, f0=200.0 + 17 * i, seed=600 + i)
        mix = s1 + s2
        mix = mix - mix.mean()
        for d, x in (("mix_clean", mix), ("s1", s1), ("s2", s2)):
            q = np.clip(np.round(x * 32768.0), -32768, 32767).astype(
                np.int16)
            wavfile.write(str(base / d / f"utt_{i:02d}.wav"), FS, q)
    return str(base)
