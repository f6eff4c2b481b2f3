"""Config -> object builders (the `hydra.utils.instantiate` equivalent)."""
from __future__ import annotations

from typing import Any, Dict

from ditsep_tpu.models import LatentScoreModelNCSNpp, ScoreModelNCSNpp
from ditsep_tpu.models.oobleck import OobleckVAE
from ditsep_tpu.sdes import SDERegistry
from ditsep_tpu.training.diffsep import DiffSepConfig, DiffSepTrainer
from ditsep_tpu.training.diffsep_latent import LatentDiffSepTrainer


def build_sde(cfg: Dict[str, Any]):
    cfg = dict(cfg)
    kind = cfg.pop("kind")
    cls = SDERegistry.get_by_name(kind)
    if kind in ("ouve", "sbve"):
        cfg.pop("ndim", None)
    return cls(**cfg)


def build_score_model(cfg: Dict[str, Any]):
    cfg = dict(cfg)
    kind = cfg.pop("kind")
    # dtype arrives as a string from config overrides (e.g.
    # model.score_model.dtype=bfloat16 / the evaluate CLI's --bf16);
    # bf16 compute is validated 47-80 dB SI-SDR vs f32 through the full
    # sampler (PARITY.md perf table)
    dt = cfg.get("dtype")
    if isinstance(dt, str):
        import jax.numpy as jnp
        cfg["dtype"] = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                        "f32": None, "float32": None}[dt]
    if kind == "ScoreModelNCSNpp":
        return ScoreModelNCSNpp(**cfg)
    if kind == "LatentScoreModelNCSNpp":
        return LatentScoreModelNCSNpp(**cfg)
    raise ValueError(f"unknown score model {kind}")


def build_oobleck_vae(cfg: Dict[str, Any]) -> OobleckVAE:
    keep = {k: v for k, v in cfg.items()
            if k in ("in_channels", "out_channels", "channels", "latent_dim",
                     "c_mults", "strides", "use_snake", "soft_clip",
                     "dtype")}
    # same string coercion as build_score_model (model.vae.dtype=bfloat16
    # from CLI overrides); bf16 VAE compute is what the latent bench
    # measures (scripts/latent_bench.py) — without this the serving path
    # silently ran the VAE in f32
    dt = keep.get("dtype")
    if isinstance(dt, str):
        import jax.numpy as jnp
        keep["dtype"] = {"bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
                         "f32": None, "float32": None}[dt]
    return OobleckVAE(**keep)


def _diffsep_cfg(model_cfg: Dict[str, Any]) -> DiffSepConfig:
    m = model_cfg
    return DiffSepConfig(
        n_speakers=m.get("n_speakers", 2),
        t_eps=m.get("t_eps", 0.03),
        t_rev_init=m.get("t_rev_init", 0.03),
        ema_decay=m.get("ema_decay", 0.999),
        time_sampling_strategy=m.get("time_sampling_strategy", "uniform"),
        train_source_order=m.get("train_source_order", "power"),
        init_hack=m.get("init_hack", 5),
        init_hack_p=m.get("init_hack_p", 0.1),
        mmnr_thresh_pit=m.get("mmnr_thresh_pit", -10.0),
        lr=m.get("lr", 2e-4),
        lr_warmup=m.get("lr_warmup"),
        grad_clip=m.get("grad_clip", 5.0),
        sampler_N=m.get("sampler", {}).get("N", 30),
        sampler_snr=m.get("sampler", {}).get("snr", 0.5),
        sampler_corrector_steps=m.get("sampler", {}).get(
            "corrector_steps", 1),
        network_scaling=m.get("network_scaling", "1/sigma"),
        c=m.get("c", "edm"),
        sigma_data=m.get("sigma_data", 0.1),
    )


def build_diffsep_trainer(cfg: Dict[str, Any]) -> DiffSepTrainer:
    """Waveform-domain trainer from a diffsep/diffsep_ouve/diffsep_sb
    family config."""
    m = cfg["model"]
    return DiffSepTrainer(
        model=build_score_model(m["score_model"]),
        sde=build_sde(m["sde"]),
        cfg=_diffsep_cfg(m),
    )


def build_latent_trainer(cfg: Dict[str, Any]) -> LatentDiffSepTrainer:
    """Latent-domain trainer from a latent_diffsep_ouve family config."""
    m = cfg["model"]
    return LatentDiffSepTrainer(
        model=build_score_model(m["score_model"]),
        sde=build_sde(m["sde"]),
        vae=build_oobleck_vae(m["vae"]),
        cfg=_diffsep_cfg(m),
    )
