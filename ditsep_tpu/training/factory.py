"""Training-wrapper factory.

TPU-native counterpart of the reference's
create_training_wrapper_from_config (reference:
src/stable_audio_tools/training/factory.py:5-158): maps a model JSON
config's `training` block onto the matching functional trainer. The
reference returns stateful LightningModules; here every trainer is a
frozen dataclass whose state lives in an explicit TrainState, so this
factory returns the configured trainer — `init_state`/`train_step`
drive it. EMA needs no model copies (reference factory.py:15-27's
double-instantiation hack): EMA params are a tree in the state.
"""
from __future__ import annotations

from typing import Any, Dict


def _opt_overrides(training: Dict[str, Any], group: str) -> Dict[str, Any]:
    """lr / betas / weight_decay from optimizer_configs[group], matching
    the reference's AdamW schema (reference: factory.py:44-51 consumers,
    oobleck_finetune.json training.optimizer_configs)."""
    out: Dict[str, Any] = {}
    oc = (training.get("optimizer_configs") or {}).get(group, {})
    c = oc.get("optimizer", {}).get("config", {})
    if "lr" in c:
        out["lr"] = c["lr"]
    if "betas" in c:
        out["b1"], out["b2"] = c["betas"]
    if "weight_decay" in c:
        out["weight_decay"] = c["weight_decay"]
    return out


def create_trainer_from_config(model_config: Dict[str, Any], model: Any):
    """Dispatch on model_type like the reference factory
    (reference: training/factory.py:5-158). `model` is whatever
    models.factory.create_model_from_config returned for this config."""
    model_type = model_config.get("model_type")
    assert model_type is not None, "model_type must be specified"
    training = model_config.get("training")
    assert training is not None, "training config must be specified"

    if model_type == "autoencoder":
        # (reference: factory.py:12-56 -> AutoencoderTrainingWrapper)
        from ditsep_tpu.models.discriminators import (
            create_discriminator_from_config)
        from ditsep_tpu.training.autoencoder import (
            AutoencoderLossConfig, AutoencoderTrainer)

        lc = training.get("loss_configs") or {}
        weights = {}
        for grp in ("spectral", "time", "bottleneck", "discriminator"):
            weights.update((lc.get(grp) or {}).get("weights", {}))
        loss_cfg = AutoencoderLossConfig(
            mrstft=weights.get("mrstft", 1.0),
            l1=weights.get("l1", 0.0),
            kl=weights.get("kl", 1e-4),
            adversarial=weights.get("adversarial", 0.1),
            feature_matching=weights.get("feature_matching", 5.0),
            sample_rate=model_config.get("sample_rate", 8000),
        )
        disc_cfg = lc.get("discriminator")
        # route the model's audio channel count and rate into the
        # discriminator (a stereo config must not get a mono MS-STFT
        # disc, nor a 44.1k config mel/CQT banks laid out for 8 kHz)
        audio_ch = (model_config.get("model", {}).get("encoder", {})
                    .get("config", {}).get("in_channels")
                    or model_config.get("audio_channels", 1))
        disc = (None if disc_cfg is None
                else create_discriminator_from_config(
                    disc_cfg, in_channels=int(audio_ch),
                    sample_rate=int(model_config.get("sample_rate",
                                                     8000))))

        def tx_for(group):
            oc = (training.get("optimizer_configs") or {}).get(group)
            if oc is None or "optimizer" not in oc:
                return None
            from ditsep_tpu.training.schedules import (
                create_optimizer_from_config)
            return create_optimizer_from_config(oc["optimizer"],
                                                oc.get("scheduler"))

        teacher_vae = None
        teacher_params = None
        t_cfg = training.get("teacher_model")
        if t_cfg is not None:
            # (reference: factory.py:29-40 — the teacher is built from
            # its own model config and MUST come with weights)
            ckpt = training.get("teacher_model_ckpt")
            if ckpt is None:
                raise ValueError(
                    "teacher_model_ckpt must be specified if "
                    "teacher_model is specified")
            import jax

            from ditsep_tpu.models.factory import create_model_from_config
            from ditsep_tpu.utils.checkpoint import load_params_npz
            teacher_vae = create_model_from_config(t_cfg)
            dummy = jax.numpy.zeros(
                (1, t_cfg["model"].get("encoder", {}).get(
                    "config", {}).get("in_channels", 1),
                 4 * teacher_vae.downsampling_ratio))
            template = jax.jit(teacher_vae.init)(
                jax.random.PRNGKey(0), dummy)
            teacher_params = {"params": load_params_npz(
                ckpt, template["params"])}

        return AutoencoderTrainer(
            vae=model, disc=disc, loss_cfg=loss_cfg,
            lr=training.get("learning_rate", 1.5e-4),
            warmup_steps=training.get("warmup_steps", 0),
            encoder_freeze_on_warmup=training.get(
                "encoder_freeze_on_warmup", False),
            latent_mask_ratio=training.get("latent_mask_ratio", 0.0),
            teacher_vae=teacher_vae, teacher_params=teacher_params,
            vae_tx=tx_for("autoencoder"), disc_tx=tx_for("discriminator"))

    if model_type == "diffusion_autoencoder":
        # (reference: factory.py:119-136 ->
        # DiffusionAutoencoderTrainingWrapper): joint encoder+decoder
        # training with latent input-concat conditioning
        from ditsep_tpu.training.diffusion import DiffAETrainer

        return DiffAETrainer(
            model=model,
            lr=training.get("learning_rate", 1e-4),
            timestep_sampler=training.get("timestep_sampler", "uniform"))

    if model_type in ("diffusion_uncond", "diffusion_cond",
                      "diffusion_cond_inpaint", "diffusion_prior"):
        # (reference: factory.py:57-118 -> Diffusion*TrainingWrapper).
        # models.factory returns (dit, routing, cond_cfgs) for cond
        # types and the bare net for uncond; diffusion_prior trains the
        # same conditioned objective (the mono/dual-mono conditioning
        # pair is constructed by the data path /
        # inference.diffusion_prior.stereoize).
        from ditsep_tpu.training.diffusion import DiffusionTrainer

        routing = None
        net = model
        if isinstance(model, tuple):
            net, routing = model[0], model[1]
        return DiffusionTrainer(
            model=net,
            objective=model_config.get("model", {}).get(
                "diffusion", {}).get("diffusion_objective", "v"),
            timestep_sampler=training.get("timestep_sampler", "uniform"),
            lr=training.get("learning_rate", 1e-4),
            cfg_dropout_prob=training.get("cfg_dropout_prob", 0.1),
            routing=routing,
            inpaint=(model_type == "diffusion_cond_inpaint"),
            max_mask_segments=training.get("max_mask_segments", 10),
            mono_stereo_prior=(model_type == "diffusion_prior"
                               and training.get("prior_type",
                                                "mono_stereo")
                               == "mono_stereo"),
        )

    if model_type == "lm":
        # (reference: factory.py:137-155 -> AudioLanguageModelTrainingWrapper)
        from ditsep_tpu.training.lm import LMTrainer

        lm, pattern = model if isinstance(model, tuple) else (model, None)
        kw = {"lr": training.get("learning_rate", 1e-4)}
        kw.update(_opt_overrides(training, "lm"))
        return LMTrainer(model=lm, pattern=pattern, **kw)

    raise NotImplementedError(f"Unknown model type: {model_type}")
