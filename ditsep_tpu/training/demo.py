"""Demo callbacks: periodic media generation during training.

TPU-native counterpart of the reference's per-model demo callbacks and
their factory (reference: src/stable_audio_tools/training/factory.py:
160-245 create_demo_callback_from_config; AutoencoderDemoCallback
training/autoencoders.py, Diffusion*DemoCallback training/diffusion.py,
AudioLanguageModelDemoCallback training/lm.py). Functional design: each
callback is a frozen dataclass invoked as
``cb(logger, step, model, params, key, ...)`` from the training loop —
no Lightning hooks; the loop decides when by checking ``cb.due(step)``.
Audio lands in the MetricsLogger's tensorboard/wandb sinks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax

Array = jax.Array


def _log_wavs(logger, tag: str, audio: Array, step: int, fs: int,
              limit: int) -> None:
    import numpy as np
    a = np.asarray(audio)
    for i in range(min(a.shape[0], limit)):
        logger.log_audio(f"{tag}/{i}", a[i].reshape(-1), step, fs=fs)


@dataclasses.dataclass(frozen=True)
class AutoencoderDemoCallback:
    """Reconstruct a fixed batch and log real/recon pairs
    (reference: training/autoencoders.py AutoencoderDemoCallback)."""

    demo_every: int = 2000
    sample_rate: int = 8000
    max_num_sample: int = 4

    def due(self, step: int) -> bool:
        return self.demo_every > 0 and step % self.demo_every == 0

    def __call__(self, logger, step: int, model, params,
                 demo_reals: Array, key: Optional[Array] = None) -> None:
        lat = model.apply(params, demo_reals, key=key,
                          method=model.encode)
        rec = model.apply(params, lat, method=model.decode)
        _log_wavs(logger, "demo/real", demo_reals, step,
                  self.sample_rate, self.max_num_sample)
        _log_wavs(logger, "demo/recon", rec, step,
                  self.sample_rate, self.max_num_sample)


@dataclasses.dataclass(frozen=True)
class DiffusionDemoCallback:
    """Sample from a (conditional) diffusion model at several CFG scales
    and log the audio (reference: training/diffusion.py
    DiffusionUncondDemoCallback / DiffusionCondDemoCallback /
    DiffusionCondInpaintDemoCallback / DiffusionPriorDemoCallback /
    DiffusionAutoencoderDemoCallback — one callback here: the variants
    differ only in conditioning inputs, which callers pass through)."""

    demo_every: int = 2000
    demo_steps: int = 250
    sample_size: int = 65536
    sample_rate: int = 8000
    io_channels: int = 64
    num_demos: int = 4
    demo_cfg_scales: Sequence[float] = (1.0,)
    diffusion_objective: str = "v"

    def due(self, step: int) -> bool:
        return self.demo_every > 0 and step % self.demo_every == 0

    def __call__(self, logger, step: int, model, params, key: Array,
                 cond_inputs: Optional[Dict[str, Array]] = None,
                 pretransform=None) -> None:
        import inspect

        from ditsep_tpu.inference.generation import generate_diffusion_cond

        # nets without CFG/conditioning kwargs (e.g. DAU1d) ignore them
        accepted = set(inspect.signature(
            type(model).__call__).parameters)
        takes_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD
                       for p in inspect.signature(
                           type(model).__call__).parameters.values())

        for scale in self.demo_cfg_scales:
            def model_fn(x, t, **kw):
                if not takes_kw:
                    kw = {k: v for k, v in kw.items() if k in accepted}
                return model.apply(params, x, t, **kw)

            audio = generate_diffusion_cond(
                model_fn, key, steps=self.demo_steps,
                cfg_scale=float(scale), batch_size=self.num_demos,
                sample_size=self.sample_size, io_channels=self.io_channels,
                cond_inputs=cond_inputs,
                diffusion_objective=self.diffusion_objective,
                pretransform=pretransform)
            _log_wavs(logger, f"demo/cfg_{scale:g}", audio, step,
                      self.sample_rate, self.num_demos)


@dataclasses.dataclass(frozen=True)
class LMDemoCallback:
    """Generate token grids from the audio LM and decode through the
    discrete pretransform when one is given (reference: training/lm.py
    AudioLanguageModelDemoCallback)."""

    demo_every: int = 2000
    sample_size: int = 65536
    sample_rate: int = 8000
    num_demos: int = 4
    pattern: Any = None

    def due(self, step: int) -> bool:
        return self.demo_every > 0 and step % self.demo_every == 0

    def __call__(self, logger, step: int, model, params, key: Array,
                 pretransform=None, length: Optional[int] = None) -> None:
        from ditsep_tpu.models.lm import lm_generate

        if length is None:
            ratio = (pretransform.downsampling_ratio
                     if pretransform is not None else 2048)
            length = max(self.sample_size // ratio, 1)
        tokens = lm_generate(model, params, key, batch=self.num_demos,
                             length=length, pattern=self.pattern)
        logger.log({"demo/token_min": float(tokens.min()),
                    "demo/token_max": float(tokens.max())}, step)
        if pretransform is not None:
            audio = pretransform.decode_tokens(tokens)
            _log_wavs(logger, "demo/lm", audio, step, self.sample_rate,
                      self.num_demos)


@dataclasses.dataclass(frozen=True)
class SeparationDemoCallback:
    """Separate a fixed demo mixture periodically during diffsep-family
    training and log mix/estimates/targets (the reference's
    LDMDemoCallback analogue for score training, src/ldm.py:630-726).
    Plugs into ``training.loop.fit(callbacks=(...,))``: the loop calls
    ``cb(logger, step, trainer, state, key)`` whenever ``due(step)``."""

    demo_batch: Any  # (mix (B,1,T), target (B,n,T)) numpy/jnp arrays
    demo_every: int = 2000
    sample_rate: int = 8000
    max_num_sample: int = 2
    sampler_N: Optional[int] = None  # None = trainer's configured N

    def due(self, step: int) -> bool:
        return self.demo_every > 0 and step % self.demo_every == 0

    def __call__(self, logger, step: int, trainer, state, key) -> None:
        import jax.numpy as jnp
        mix, target = self.demo_batch
        mix = jnp.asarray(mix)
        kw = {"N": self.sampler_N} if self.sampler_N else {}
        # EMA params at demo time, like validation (src/diffsep.py:586)
        est, _ = trainer.separate(state.ema_params, key, mix, **kw)
        _log_wavs(logger, "demo/mix", mix, step, self.sample_rate,
                  self.max_num_sample)
        for s in range(est.shape[1]):
            _log_wavs(logger, f"demo/est_{s}", est[:, s:s + 1], step,
                      self.sample_rate, self.max_num_sample)
            _log_wavs(logger, f"demo/target_{s}",
                      jnp.asarray(target)[:, s:s + 1], step,
                      self.sample_rate, self.max_num_sample)


def create_demo_callback_from_config(model_config: Dict[str, Any],
                                     **kwargs):
    """Dispatch on model_type like the reference factory
    (reference: training/factory.py:160-245)."""
    model_type = model_config.get("model_type")
    assert model_type is not None, "model_type must be specified"
    training = model_config.get("training")
    assert training is not None, "training config must be specified"
    demo = training.get("demo", {})
    common = dict(
        demo_every=demo.get("demo_every", 2000),
        sample_rate=model_config.get("sample_rate", 8000),
    )
    if model_type == "autoencoder":
        return AutoencoderDemoCallback(
            max_num_sample=demo.get("max_num_sample", 4), **common)
    if model_type in ("diffusion_uncond", "diffusion_cond",
                      "diffusion_cond_inpaint", "diffusion_prior",
                      "diffusion_autoencoder"):
        model = model_config.get("model", {})
        # cond schema: model.diffusion.io_channels; uncond schema:
        # model.config.io_channels (e.g. DAU1d dance_diffusion configs)
        io_ch = model.get("diffusion", {}).get(
            "io_channels",
            model.get("config", {}).get("io_channels",
                                        model.get("io_channels", 64)))
        return DiffusionDemoCallback(
            demo_steps=demo.get("demo_steps", 250),
            sample_size=model_config.get("sample_size", 65536),
            io_channels=kwargs.get("io_channels", io_ch),
            num_demos=demo.get("num_demos", 4),
            demo_cfg_scales=tuple(demo.get("demo_cfg_scales", (1.0,))),
            diffusion_objective=model.get("diffusion", {}).get(
                "diffusion_objective", "v"),
            **common)
    if model_type == "lm":
        return LMDemoCallback(
            sample_size=model_config.get("sample_size", 65536),
            num_demos=demo.get("num_demos", 4),
            pattern=kwargs.get("pattern"),
            **common)
    raise NotImplementedError(f"Unknown model type: {model_type}")
