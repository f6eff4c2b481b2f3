"""Offline artifact-level harness parity (VERDICT r3 item 1).

Runs the reference's OWN evaluation harness executable —
``evaluate_process`` (reference: src/evaluate_mp.py:212-354, workers=0,
torch CPU) followed by its ``summarize`` + JSON aggregation
(src/evaluate_mp.py:516-529) — over a synthetic LibriMix-layout test set
on disk, with a crafted checkpoint, and diffs the per-utterance result
JSON against our ``eval.evaluate_dataset`` (the exact function
``cli/evaluate`` drives) with the SAME imported weights and the SAME
noise draws.

What is real on the reference side: ``DiffSepModel`` (src/diffsep.py),
``WSJ0_mix`` (src/datasets/wsj0_mix.py), ``sdes`` (samplers, MixSDE),
``utils.separate`` (normalize), ``evaluate_process`` + ``summarize``
themselves. What is stubbed (this image has no egress; the wheels are
uninstallable):

* torchaudio         -> torch.stft/istft spectrogram stub + scipy WAV
                        load (same int16 decode as torchaudio's)
* pytorch_lightning  -> LightningModule = torch.nn.Module + no-op
                        save_hyperparameters/log
* torch_ema          -> faithful minimal ExponentialMovingAverage
* hydra / omegaconf  -> instantiate/DictConfig attr-dict equivalents
* fast_bss_eval      -> an independent torch implementation of
                        si_bss_eval_sources written here from the
                        BSS-eval SI definitions (Le Roux et al. 2019)
                        and fast_bss_eval's documented contract
                        (zero_mean / clamp_db / ref-ordered metrics,
                        est[perm] aligns to ref). This is what our
                        numpy metric stack is cross-validated against.
* pesq / pystoi      -> routed to the in-repo P.862 / (E)STOI
                        implementations ON BOTH SIDES — for these two
                        fields the diff validates permutation
                        alignment + plumbing, not the algorithms
                        (those have their own oracle tests).

The per-utterance stochastic budget (prior + per-step corrector /
predictor draws) is pre-generated and fed to both sides, so any drift
in normalize / sampler / STFT / metric semantics shows up as a
per-field delta. Scale note: the reference computes metrics in
mix-normalized space and never denormalizes (evaluate_mp.py:305,331);
ours denormalizes and scores against the raw target. SI metrics are
scale-invariant and the synthetic mixes are zero-mean to quantization,
so the affine difference is negligible (measured in the artifact).
"""
from __future__ import annotations

import importlib
import json
import os
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np

REF_SRC = "/root/reference/src"
# hardcoded in the reference executable (evaluate_mp.py:233); intercepted
# by injecting `open` into the module's globals rather than creating the
# path on disk
REF_HPARAMS_PATH = ("/research/milsrg1/user_workspace/efb48/DiTSep/"
                    "checkpoints/diffsep/hparams.yaml")

FS = 8000
N_STEPS = 4
SNR = 0.5
T_EPS = 0.03
CORRECTOR_STEPS = 1
# two 64-frame STFT blocks (510/128 grid): 8000 -> 66 frames (block 2),
# 20000 -> 160 frames (block 3); four utterances each so both of our
# eval buckets pad every utterance to its NATIVE length (matched noise
# then needs no padding semantics)
LENS = [8000] * 4 + [20000] * 4
MODEL_KW = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=2,
                attn_resolutions=(64,), image_size=256)


# ----------------------------------------------------------- stubs -------
def _stub_module(name):
    m = types.ModuleType(name)
    import importlib.machinery
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


class DictConfig:
    """Attribute-style recursive dict mirroring the omegaconf surface the
    reference eval path touches (attr get/set, mapping protocol, pop,
    update(merge=), copy)."""

    def __init__(self, d=None):
        object.__setattr__(self, "_d", {})
        for k, v in (d or {}).items():
            self._d[k] = _wrap_cfg(v)

    def __getattr__(self, k):
        try:
            return self._d[k]
        except KeyError:
            raise AttributeError(k)

    def __setattr__(self, k, v):
        self._d[k] = _wrap_cfg(v)

    def __delattr__(self, k):
        # evaluate_latent does `del ds_args._target_`
        # (src/evaluate_latent.py:186)
        try:
            del self._d[k]
        except KeyError:
            raise AttributeError(k)

    __getitem__ = lambda self, k: self._d[k]
    __setitem__ = __setattr__
    __contains__ = lambda self, k: k in self._d
    __iter__ = lambda self: iter(self._d)
    __len__ = lambda self: len(self._d)
    keys = lambda self: self._d.keys()
    values = lambda self: self._d.values()
    items = lambda self: self._d.items()

    def get(self, k, default=None):
        return self._d.get(k, default)

    def pop(self, k, *default):
        return self._d.pop(k, *default)

    def update(self, other=None, merge=True, **kw):
        for src in (other or {}), kw:
            for k, v in dict(src).items():
                self._d[k] = _wrap_cfg(v)

    def copy(self):
        return DictConfig(_unwrap_cfg(self))

    def __repr__(self):
        return f"DictConfig({self._d!r})"


def _wrap_cfg(v):
    return DictConfig(v) if isinstance(v, dict) else v


def _unwrap_cfg(v):
    if isinstance(v, DictConfig):
        return {k: _unwrap_cfg(x) for k, x in v.items()}
    return v


def _install_omegaconf():
    existing = sys.modules.get("omegaconf")
    if existing is not None:
        # another test's narrower stub (e.g. test_facodec_parity's,
        # which only exposes OmegaConf) may already be installed when
        # the whole suite runs in one process; ours is a strict
        # superset, so replace anything lacking the symbols the
        # reference executables import (DictConfig, open_dict)
        if hasattr(existing, "DictConfig") and hasattr(existing,
                                                       "open_dict"):
            return
    import contextlib

    import yaml

    oc = _stub_module("omegaconf")
    oco = _stub_module("omegaconf.omegaconf")

    class OmegaConf:
        @staticmethod
        def load(path):
            p = Path(path)
            if not p.exists():  # reference runs with cwd=repo root
                p = Path("/root/reference") / path
            with open(p) as f:
                return _wrap_cfg(yaml.safe_load(f))

        @staticmethod
        def create(obj=None):
            if isinstance(obj, DictConfig):
                return obj
            return _wrap_cfg(dict(obj or {}))

        @staticmethod
        def to_container(cfg, resolve=False):
            return _unwrap_cfg(cfg)

    @contextlib.contextmanager
    def open_dict(cfg):
        yield cfg

    oc.OmegaConf = OmegaConf
    oc.DictConfig = DictConfig
    oc.ListConfig = list
    oc.open_dict = open_dict
    oco.open_dict = open_dict
    oco.OmegaConf = OmegaConf
    oc.omegaconf = oco
    sys.modules["omegaconf"] = oc
    sys.modules["omegaconf.omegaconf"] = oco


def _install_hydra():
    """hydra.utils.instantiate handling _recursive_/_partial_ BOTH inside
    the config and as call-time kwargs (DiffSepModel passes
    _recursive_=False as a kwarg, src/diffsep.py:39), plus the @hydra.main
    decorator evaluate_mp applies at import (evaluate_mp.py:398)."""
    hy = sys.modules.get("hydra") or _stub_module("hydra")
    hu = getattr(hy, "utils", None) or _stub_module("hydra.utils")

    def instantiate(cfg, **kw):
        cfg = dict(cfg)
        kw = dict(kw)
        for d in (cfg, kw):
            d.pop("_recursive_", None)
            d.pop("_partial_", None)
        tgt = cfg.pop("_target_")
        cfg.update(kw)
        mod, cls = tgt.rsplit(".", 1)
        return getattr(importlib.import_module(mod), cls)(**cfg)

    hu.instantiate = instantiate
    hu.to_absolute_path = lambda p: os.path.abspath(p)
    hy.utils = hu
    hy.main = lambda *a, **k: (lambda f: f)
    sys.modules["hydra"] = hy
    sys.modules["hydra.utils"] = hu


def _install_lightning():
    if "pytorch_lightning" in sys.modules:
        pl = sys.modules["pytorch_lightning"]
        if hasattr(pl, "LightningModule"):
            return
    import torch

    pl = _stub_module("pytorch_lightning")

    class LightningModule(torch.nn.Module):
        trainer = None

        def save_hyperparameters(self, *a, **k):
            pass

        def log(self, *a, **k):
            pass

        def log_dict(self, *a, **k):
            pass

    class LightningDataModule:
        def __init__(self, *a, **k):
            pass

    pl.LightningModule = LightningModule
    pl.LightningDataModule = LightningDataModule
    pl.Callback = object
    sys.modules["pytorch_lightning"] = pl


def _install_torch_ema():
    if "torch_ema" in sys.modules:
        return
    import torch

    te = _stub_module("torch_ema")

    class ExponentialMovingAverage:
        """Faithful minimal torch_ema: shadow copies + store/copy_to/
        restore as DiffSepModel's train/eval swap uses them
        (reference: src/diffsep.py:586-606)."""

        def __init__(self, parameters, decay):
            self.decay = decay
            self.shadow_params = [p.clone().detach()
                                  for p in parameters]
            self.collected_params = None

        def update(self, parameters):
            d = self.decay
            with torch.no_grad():
                for s, p in zip(self.shadow_params, parameters):
                    s.mul_(d).add_(p, alpha=1.0 - d)

        def store(self, parameters):
            self.collected_params = [p.clone() for p in parameters]

        def copy_to(self, parameters):
            for p, s in zip(parameters, self.shadow_params):
                p.data.copy_(s.data)

        def restore(self, parameters):
            for p, c in zip(parameters, self.collected_params):
                p.data.copy_(c.data)

        def to(self, *a, **k):
            return self

        def state_dict(self):
            return {"decay": self.decay,
                    "shadow_params": self.shadow_params,
                    "collected_params": self.collected_params}

        def load_state_dict(self, sd):
            self.decay = sd["decay"]
            self.shadow_params = list(sd["shadow_params"])
            self.collected_params = sd.get("collected_params")

    te.ExponentialMovingAverage = ExponentialMovingAverage
    sys.modules["torch_ema"] = te


def _install_fast_bss_eval():
    if "fast_bss_eval" in sys.modules:
        return
    import torch

    fb = _stub_module("fast_bss_eval")

    def si_bss_eval_sources(ref, est, zero_mean=False,
                            compute_permutation=True, clamp_db=None):
        """Independent torch implementation of the fast_bss_eval
        contract: scale-invariant BSS-eval SDR/SIR/SAR over (B, n, T)
        with metrics ordered by REFERENCE and ``est[b, perm[b]]``
        aligned to ``ref[b]``; optional mean removal and +-clamp_db
        clamping (the reference harness calls zero_mean=False,
        clamp_db=100 — evaluate_mp.py:173-175)."""
        import itertools

        ref = ref.double()
        est = est.double()
        if zero_mean:
            ref = ref - ref.mean(dim=-1, keepdim=True)
            est = est - est.mean(dim=-1, keepdim=True)
        B, n, _ = ref.shape
        eps = 1e-10
        sdr = torch.zeros(B, n)
        sir = torch.zeros(B, n)
        sar = torch.zeros(B, n)
        perm_out = torch.zeros(B, n, dtype=torch.long)
        for b in range(B):
            R, E = ref[b], est[b]
            G = R @ R.T + eps * torch.eye(n, dtype=R.dtype)
            sdr_m = torch.zeros(n, n, dtype=R.dtype)
            sir_m = torch.zeros(n, n, dtype=R.dtype)
            sar_m = torch.zeros(n, n, dtype=R.dtype)
            for i in range(n):
                c = torch.linalg.solve(G, R @ E[i])
                p_s = c @ R
                e_art = E[i] - p_s
                for j in range(n):
                    s_t = (E[i] @ R[j]) / (R[j] @ R[j]).clamp(
                        min=eps) * R[j]
                    e_int = p_s - s_t
                    num = (s_t @ s_t).clamp(min=eps)
                    e_tot = e_int + e_art
                    sdr_m[i, j] = 10 * torch.log10(
                        num / (e_tot @ e_tot).clamp(min=eps))
                    sir_m[i, j] = 10 * torch.log10(
                        num / (e_int @ e_int).clamp(min=eps))
                    s_pi = s_t + e_int
                    sar_m[i, j] = 10 * torch.log10(
                        (s_pi @ s_pi).clamp(min=eps)
                        / (e_art @ e_art).clamp(min=eps))
            best_v, best_p = None, tuple(range(n))
            for p in itertools.permutations(range(n)):
                v = sum(sdr_m[p[j], j] for j in range(n))
                if best_v is None or v > best_v:
                    best_v, best_p = v, p
            p = torch.as_tensor(best_p)  # p[j] = est index for ref j
            cols = torch.arange(n)
            sdr[b], sir[b], sar[b] = (m[p, cols].float()
                                      for m in (sdr_m, sir_m, sar_m))
            perm_out[b] = p
        if clamp_db is not None:
            sdr = sdr.clamp(-clamp_db, clamp_db)
            sir = sir.clamp(-clamp_db, clamp_db)
            sar = sar.clamp(-clamp_db, clamp_db)
        return sdr, sir, sar, perm_out

    fb.si_bss_eval_sources = si_bss_eval_sources
    sys.modules["fast_bss_eval"] = fb


def _install_pesq_pystoi():
    """pesq / pystoi wheels are uninstallable here: route both sides to
    the in-repo P.862 / STOI implementations (these two result fields
    then check plumbing + permutation alignment, not the algorithms)."""
    if "pesq" not in sys.modules:
        from ditsep_tpu.eval.pesq_p862 import pesq as _pesq

        pq = _stub_module("pesq")
        pq.pesq = lambda fs, ref, deg, mode="nb": _pesq(fs, ref, deg, mode)
        sys.modules["pesq"] = pq
    if "pystoi" not in sys.modules:
        from ditsep_tpu.eval.metrics import stoi as _stoi

        ps = _stub_module("pystoi")
        ps.stoi = lambda x, y, fs, extended=False: _stoi(
            x, y, fs, extended=extended)
        sys.modules["pystoi"] = ps


def _extend_torchaudio_stub():
    """The full-pipeline stub covers transforms; the dataset + evaluate_mp
    additionally need set_audio_backend and load (scipy int16 decode —
    the same /32768 conversion torchaudio's sox_io backend applies)."""
    import torch

    ta = sys.modules["torchaudio"]
    if hasattr(ta, "load"):
        return

    def load(path):
        from scipy.io import wavfile

        fs, data = wavfile.read(str(path))
        if data.dtype == np.int16:
            data = data.astype(np.float32) / 32768.0
        else:
            data = data.astype(np.float32)
        if data.ndim == 1:
            data = data[None, :]
        else:
            data = data.T
        return torch.from_numpy(data), fs

    ta.load = load
    ta.set_audio_backend = lambda *a, **k: None
    ta.save = lambda *a, **k: None


def install_ref_eval_stubs():
    """Install everything evaluate_mp.py needs, reusing the torchaudio/
    hydra/utils stubs from the full-pipeline parity oracle."""
    from test_full_pipeline_parity import (_install_torchaudio_stub,
                                           _install_utils_stub)
    from test_ncsnpp import _install_reference

    _install_reference()          # CUDA op stub + REF_SRC on sys.path
    _install_omegaconf()
    _install_hydra()              # corrected instantiate + @hydra.main
    _install_lightning()
    _install_torch_ema()
    _install_fast_bss_eval()
    _install_pesq_pystoi()
    _install_torchaudio_stub()
    _extend_torchaudio_stub()
    _install_utils_stub()
    # diffsep.py touches utils.<name> at top level (src/diffsep.py:80,
    # 1204...); the pipeline stub only exposes submodules
    u = sys.modules["utils"]
    sep = u.separate
    for name in ("normalize_batch", "denormalize_batch", "shuffle_sources",
                 "select_elem_at_random", "power_order_sources"):
        setattr(u, name, getattr(sep, name))


# ------------------------------------------------- synthetic test set ----
def _speechlike(t_len, f0, seed):
    """Zero-mean harmonic + noise signal (voiced-speech-like envelope)."""
    rng = np.random.default_rng(seed)
    t = np.arange(t_len) / FS
    x = np.zeros(t_len)
    for h in range(1, 6):
        x += rng.uniform(0.2, 1.0) / h * np.sin(
            2 * np.pi * f0 * h * t + rng.uniform(0, 2 * np.pi))
    env = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(1.5, 4.0) * t
                               + rng.uniform(0, 2 * np.pi))
    x = x * env + 0.05 * rng.standard_normal(t_len)
    x = x / np.max(np.abs(x)) * 0.35
    return (x - x.mean()).astype(np.float32)


def write_synthetic_librimix(data_dir: str):
    """LibriMix-layout synthetic test set readable by BOTH the reference
    WSJ0_mix (src/datasets/wsj0_mix.py:67-101, mix_dir='mix_clean') and
    our data.wsj0_mix.WSJ0Mix. int16 PCM so both loaders decode
    bit-identically."""
    from scipy.io import wavfile

    base = Path(data_dir) / "Libri2Mix" / "wav8k" / "max" / "test"
    for d in ("mix_clean", "s1", "s2"):
        (base / d).mkdir(parents=True, exist_ok=True)
    for i, L in enumerate(LENS):
        s1 = _speechlike(L, f0=110.0 + 13 * i, seed=100 + i)
        s2 = _speechlike(L, f0=200.0 + 17 * i, seed=200 + i)
        mix = s1 + s2
        mix = mix - mix.mean()  # zero-mean mix (see module docstring)
        for d, x in (("mix_clean", mix), ("s1", s1), ("s2", s2)):
            q = np.clip(np.round(x * 32768.0), -32768, 32767).astype(
                np.int16)
            wavfile.write(str(base / d / f"utt_{i:02d}.wav"), FS, q)
    return str(base)


def make_noise(seed=123):
    """The full stochastic budget, per utterance: prior (1,2,T),
    corrector (N,1,1,2,T), predictor (N,1,2,T)."""
    rng = np.random.default_rng(seed)
    out = []
    for L in LENS:
        out.append((
            rng.standard_normal((1, 2, L)).astype(np.float32),
            rng.standard_normal(
                (N_STEPS, CORRECTOR_STEPS, 1, 2, L)).astype(np.float32),
            rng.standard_normal((N_STEPS, 1, 2, L)).astype(np.float32),
        ))
    return out


def model_config_dict():
    return {
        "model": {
            "score_model": {
                "_target_":
                    "models.diffsep.score_models.ScoreModelNCSNpp",
                "num_sources": 2,
                "stft_args": {"n_fft": 510, "hop_length": 128,
                              "center": True, "pad_mode": "constant"},
                "backbone_args": {
                    "_target_": "models.diffsep.ncsnpp.NCSNpp",
                    **{k: list(v) if isinstance(v, tuple) else v
                       for k, v in MODEL_KW.items()}},
                "transform": "exponent", "spec_abs_exponent": 0.5,
                "spec_factor": 0.15},
            "sde": {"_target_": "sdes.sdes.MixSDE", "ndim": 2,
                    "d_lambda": 2.0, "sigma_min": 0.05,
                    "sigma_max": 0.5, "N": N_STEPS},
            "t_eps": T_EPS,
            "optimizer": {"lr": 1e-4},
            "loss": {"_target_": "torch.nn.MSELoss"},
            "val_losses": {},
            "sampler": {"N": N_STEPS, "snr": SNR,
                        "corrector_steps": CORRECTOR_STEPS,
                        "denoise": True},
        }
    }


def make_torch_checkpoint(ckpt_path: str):
    """Random-init torch score model (seed 0) saved as a Lightning-style
    checkpoint dict ({'state_dict': {'score_model.*': ...}}) for
    evaluate_process's torch.load + load_state_dict
    (evaluate_mp.py:258-260). Returns the bare score-model state for the
    JAX importer."""
    import torch

    from models.diffsep.score_models import ScoreModelNCSNpp as TorchScore

    cfg = model_config_dict()["model"]["score_model"]
    torch.manual_seed(0)
    tm = TorchScore(
        num_sources=cfg["num_sources"], stft_args=cfg["stft_args"],
        backbone_args=dict(cfg["backbone_args"]),
        transform=cfg["transform"],
        spec_abs_exponent=cfg["spec_abs_exponent"],
        spec_factor=cfg["spec_factor"])
    tm.eval()
    state = tm.state_dict()
    torch.save({"state_dict": {f"score_model.{k}": v
                               for k, v in state.items()}}, ckpt_path)
    return {k: v.detach().numpy() for k, v in state.items()}


# -------------------------------------------------- reference harness ----
def run_reference_harness(data_dir, ckpt_path, out_dir, noise_per_utt):
    """Drive evaluate_process + summarize + the main() JSON aggregation
    (evaluate_mp.py:212-354 and :516-529) sequentially on torch CPU."""
    import io

    import torch
    import yaml

    install_ref_eval_stubs()
    ev = importlib.import_module("evaluate_mp")

    hparams = {"config": {"datamodule": {"librimix_test": {"dataset": {
        "_target_": "datasets.WSJ0_mix", "path": str(data_dir),
        "n_spkr": 2, "fs": FS, "cut": "max", "split": "librimix_test",
    }}}}}

    real_open = open

    def fake_open(path, *a, **k):
        if str(path) == REF_HPARAMS_PATH:
            return io.StringIO(yaml.safe_dump(hparams))
        return real_open(path, *a, **k)

    args = SimpleNamespace(
        ckpt=Path(ckpt_path), dl_workers=0, N=N_STEPS,
        corrector_steps=CORRECTOR_STEPS, snr=SNR, denoise=True,
        pesq_mode="nb", stoi_no_extended=False, schedule=None, save_n=0)

    # the whole stochastic budget, queued in dataset order: per utterance
    # prior, then per step corrector + predictor (evaluate_mp iterates
    # utterances sequentially at batch_size=1)
    queue = []
    for prior_z, corr_z, pred_z in noise_per_utt:
        queue.append(prior_z)
        for s in range(N_STEPS):
            queue.append(corr_z[s, 0])
            queue.append(pred_z[s])

    def fake_randn_like(x, *a, **k):
        z = torch.from_numpy(queue.pop(0)).to(x.dtype)
        assert z.shape == x.shape, (z.shape, x.shape)
        return z

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    orig_randn_like = torch.randn_like
    ev.open = fake_open
    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            split, results = ev.evaluate_process(
                args, out, "librimix_test", 0, len(LENS), "cpu",
                model_config=sys.modules["omegaconf"].OmegaConf.create(
                    model_config_dict()))
    finally:
        torch.randn_like = orig_randn_like
        del ev.open
    assert not queue, f"{len(queue)} unconsumed reference noise draws"
    # main()'s aggregation (evaluate_mp.py:516-529)
    with open(out / f"{split}.json", "w") as f:
        json.dump(results, f, indent=2)
    summary = ev.summarize(results)
    with open(out / f"{split}_summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    return results, summary


# ------------------------------------------------------- our harness ----
def run_our_harness(data_dir, torch_state, out_dir, noise_per_utt):
    """Our real eval path: data.wsj0_mix.WSJ0Mix over the same WAVs ->
    eval.evaluate_dataset (the function cli/evaluate drives) with the
    imported weights and the same noise arrays."""
    import jax
    import jax.numpy as jnp

    from ditsep_tpu.data.wsj0_mix import WSJ0Mix
    from ditsep_tpu.eval.evaluate import (_bucket_lengths_frames,
                                          evaluate_dataset)
    from ditsep_tpu.models import import_params
    from ditsep_tpu.models.score_models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    ds = WSJ0Mix(path=data_dir, n_spkr=2, cut="max", split="librimix_test",
                 fs=FS)
    assert len(ds) == len(LENS)
    lengths = [ds.item_length(i) for i in range(len(ds))]
    assert lengths == LENS, (lengths, LENS)

    fm = ScoreModelNCSNpp(num_sources=2, n_fft=510, hop_length=128,
                          transform="exponent", spec_abs_exponent=0.5,
                          spec_factor=0.15, **MODEL_KW)
    key = jax.random.PRNGKey(0)
    variables = fm.init(key, jnp.zeros((1, 2, LENS[0])),
                        jnp.full((1,), 0.5), jnp.zeros((1, 1, LENS[0])))
    params = {"params": import_params(variables["params"], torch_state)}
    trainer = DiffSepTrainer(
        model=fm, sde=MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05,
                             sigma_max=0.5, N=N_STEPS),
        cfg=DiffSepConfig(n_speakers=2, t_eps=T_EPS))

    # predict evaluate_dataset's call order (buckets ascending by padded
    # length, indices ascending within; batch_size=1 -> one utterance per
    # call) and require native-length padding so the noise shapes match
    assigned, _merged = _bucket_lengths_frames(lengths, (510, 128, 64), 24)
    assert all(assigned[i] == lengths[i] for i in range(len(LENS))), \
        "test set must pad every utterance to its native length"
    buckets = {}
    for i, L in enumerate(lengths):
        buckets.setdefault(assigned[i], []).append(i)
    order = [i for blen in sorted(buckets) for i in buckets[blen]]

    sep_jit = jax.jit(lambda p, k, mix, nz: trainer.separate(
        p, k, mix, N=N_STEPS, snr=SNR, corrector_steps=CORRECTOR_STEPS,
        noise=nz)[0])
    state = {"call": 0}

    def sep(key, mix):
        idx = order[state["call"]]
        state["call"] += 1
        nz = tuple(jnp.asarray(a) for a in noise_per_utt[idx])
        return sep_jit(params, key, mix, nz)

    res = evaluate_dataset(
        sep, ds, fs=FS, batch_size=1, nfe=N_STEPS * (CORRECTOR_STEPS + 1),
        frame_spec=(510, 128, 64), max_buckets=24, out_dir=out_dir,
        split_name="librimix_test", warmup=False)
    assert state["call"] == len(LENS)
    return res["results"], res["summary"]


# -------------------------------------------------------------- diff ----
PER_UTT_FIELDS = ("si_sdr", "si_sir", "si_sar", "pesq", "stoi")


def diff_artifacts(ref_results, our_results):
    """Field-wise deltas between the two per-utterance artifacts plus
    exact-match checks for the discrete fields."""
    deltas = {f: 0.0 for f in PER_UTT_FIELDS}
    exact = {"nfe": True, "len_s": True, "batch_idx": True,
             "keys": sorted(str(k) for k in ref_results)
             == sorted(str(k) for k in our_results)}
    for i in sorted(int(k) for k in ref_results):
        # evaluate_process keys by int batch_idx; ours (post-json) by str
        r = ref_results[i] if i in ref_results else ref_results[str(i)]
        o = our_results[str(i)] if str(i) in our_results else our_results[i]
        for f in PER_UTT_FIELDS:
            rv = np.asarray(r[f], dtype=np.float64).reshape(-1)
            ov = np.asarray(o[f], dtype=np.float64).reshape(-1)
            assert rv.shape == ov.shape, (f, rv.shape, ov.shape)
            deltas[f] = max(deltas[f], float(np.max(np.abs(rv - ov))))
        exact["nfe"] &= bool(np.sum(r["nfe"]) == np.sum(o["nfe"]))
        exact["len_s"] &= bool(abs(r["len_s"] - o["len_s"]) < 1e-9)
        exact["batch_idx"] &= int(r["batch_idx"]) == int(o["batch_idx"])
    return deltas, {k: bool(v) for k, v in exact.items()}


def diff_summaries(ref_summary, our_summary):
    out = {}
    for f in PER_UTT_FIELDS + ("nfe", "len_s"):
        out[f] = abs(float(ref_summary[f]) - float(our_summary[f]))
    out["number_equal"] = (ref_summary["number"] == our_summary["number"])
    return out


TOL = {"si_sdr": 0.1, "si_sir": 0.1, "si_sar": 0.1,
       "pesq": 0.05, "stoi": 0.01}


def run_full_parity(workdir: str):
    """End-to-end: synth set -> both harnesses -> diff. Returns the
    artifact dict for docs/harness_parity_r04.json."""
    work = Path(workdir)
    data_dir = work / "data"
    ckpt_path = work / "epoch-000_si_sdr-0.000.ckpt"
    write_synthetic_librimix(str(data_dir))
    install_ref_eval_stubs()
    torch_state = make_torch_checkpoint(str(ckpt_path))
    noise = make_noise()
    ref_results, ref_summary = run_reference_harness(
        str(data_dir), str(ckpt_path), str(work / "ref_out"), noise)
    our_results, our_summary = run_our_harness(
        str(data_dir), torch_state, str(work / "our_out"), noise)
    deltas, exact = diff_artifacts(ref_results, our_results)
    sdeltas = diff_summaries(ref_summary, our_summary)
    return {
        "config": {"n_utts": len(LENS), "lens": LENS, "fs": FS,
                   "N": N_STEPS, "snr": SNR,
                   "corrector_steps": CORRECTOR_STEPS,
                   "model": {k: list(v) if isinstance(v, tuple) else v
                             for k, v in MODEL_KW.items()},
                   "noise": "matched (prior + per-step draws shared)"},
        "per_utterance_max_abs_delta": deltas,
        "exact_fields": exact,
        "summary_abs_delta": sdeltas,
        "tolerances": TOL,
        "pass": bool(all(deltas[f] <= TOL[f] for f in TOL)
                     and all(exact.values())),
        "reference_summary": ref_summary,
        "our_summary": our_summary,
        "notes": [
            "reference side = the reference's own evaluate_process + "
            "summarize executables (src/evaluate_mp.py:212-354,516-529) "
            "on torch CPU over its own DiffSepModel/WSJ0_mix/sdes",
            "fast_bss_eval replaced by an independent torch "
            "implementation of its documented contract (wheel "
            "uninstallable, zero egress); pesq/pystoi routed to the "
            "in-repo implementations on BOTH sides (plumbing check "
            "only for those two fields)",
            "reference computes metrics in mix-normalized space "
            "(evaluate_mp.py:305,331); ours on denormalized waveforms "
            "— SI metrics are scale-invariant and mixes are zero-mean, "
            "measured residual is inside the deltas above",
            "runtime fields are wall-clock and intentionally not "
            "compared",
        ],
    }
