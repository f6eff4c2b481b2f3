"""Functional core of the demo interface (UI-framework-free).

The reference's gradio interface couples model plumbing to UI widgets
(reference: src/stable_audio_tools/interface/gradio.py:30-425,
interfaces/diffusion_cond.py). Here every process function is a pure
callable over numpy audio + scalar knobs so the whole surface is testable
without gradio; ditsep_tpu.interface.gradio_ui builds widgets on top.

Covers the reference's tabs:
  * generate_uncond      -- unconditional diffusion sampling with the
                            sampler-type / steps / sigma knobs
                            (gradio.py:64-167)
  * generate_conditional -- prompt + seconds + CFG generation
                            (interfaces/diffusion_cond.py)
  * autoencoder_process  -- encode/decode round trip with optional latent
                            noise (gradio.py:258-311)
  * lm_process           -- token LM generation -> codec decode
                            (gradio.py:169-202, 377-400)
  * separation_process   -- DiffSep PC-sampler separation (the run_gradio
                            entry, src/inference/run_gradio.py:7-32)
  * spectrogram_preview  -- matplotlib figure like aeiou's audio_spectrogram_image
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_mono_batch(wav: np.ndarray) -> np.ndarray:
    wav = np.asarray(wav, np.float32)
    if wav.ndim == 2:  # gradio gives (T, C)
        wav = wav.mean(axis=1)
    peak = float(np.abs(wav).max()) or 1.0
    return (wav / max(peak, 1e-6))[None, None, :]


def _peak_norm(x: np.ndarray) -> np.ndarray:
    return x / max(float(np.abs(x).max()), 1e-6)


@dataclasses.dataclass
class SeparationApp:
    """Separation tab backend: trainer + params -> process function
    (reference: run_gradio separation flow)."""

    trainer: Any
    params: Any
    fs: int = 8000

    def process(self, wav: np.ndarray, n_steps: int = 30,
                snr: float = 0.5, corrector_steps: int = 1,
                seed: int = 0) -> np.ndarray:
        mix = jnp.asarray(_to_mono_batch(wav))
        est, _ = self.trainer.separate(
            self.params, jax.random.PRNGKey(seed), mix, N=int(n_steps),
            snr=float(snr), corrector_steps=int(corrector_steps))
        return _peak_norm(np.asarray(est[0]))


@dataclasses.dataclass
class AutoencoderApp:
    """Autoencoder tab backend (reference: gradio.py:258-311): encode ->
    (optional latent noise) -> decode."""

    vae: Any
    params: Any
    fs: int = 8000

    def process(self, wav: np.ndarray, latent_noise: float = 0.0,
                seed: int = 0) -> np.ndarray:
        x = jnp.asarray(_to_mono_batch(wav))
        lat = self.vae.apply(self.params, x, method=self.vae.encode)
        if latent_noise > 0:
            lat = lat + latent_noise * jax.random.normal(
                jax.random.PRNGKey(seed), lat.shape, lat.dtype)
        rec = self.vae.apply(self.params, lat, method=self.vae.decode)
        return _peak_norm(np.asarray(rec[0]).reshape(-1))


@dataclasses.dataclass
class GenerationApp:
    """Unconditional / conditional diffusion generation backends
    (reference: gradio.py:64-167 generate_uncond +
    interfaces/diffusion_cond.py generate_cond)."""

    model: Any
    params: Any
    io_channels: int = 1
    sample_size: int = 32768
    fs: int = 8000
    routing: Any = None
    conditioner: Any = None
    conditioner_vars: Any = None

    def generate_uncond(self, steps: int = 50, batch: int = 1,
                        seed: int = 0, sigma_min: float = 0.3,
                        sigma_max: float = 50.0) -> np.ndarray:
        from ditsep_tpu.inference.sampling import sample_k

        key = jax.random.PRNGKey(seed)
        noise = jax.random.normal(
            key, (batch, self.io_channels, self.sample_size))

        def model_fn(x, t):
            return self.model.apply(self.params, x, t)

        audio = sample_k(model_fn, noise, steps=int(steps),
                         sigma_min=float(sigma_min),
                         sigma_max=float(sigma_max))
        return _peak_norm(np.asarray(audio))

    def generate_conditional(self, cond_inputs: Dict[str, Any],
                             steps: int = 50, cfg_scale: float = 6.0,
                             batch: int = 1, seed: int = 0,
                             sampler_type: Optional[str] = None,
                             init_audio: Optional[np.ndarray] = None,
                             init_noise_level: float = 1.0,
                             inpaint_mask: Optional[np.ndarray] = None
                             ) -> np.ndarray:
        """Conditional generation with the reference tab's full knob set
        (interfaces/diffusion_cond.py): ``init_audio`` +
        ``init_noise_level`` give audio-prompted variations;
        ``inpaint_mask`` (1 = regenerate, 0 = keep init content, shaped
        (latent_len,) or (B, 1, latent_len)) gives inpainting."""
        from ditsep_tpu.inference.generation import generate_diffusion_cond

        assert self.routing is not None and self.conditioner is not None
        cond = self.conditioner(self.conditioner_vars, cond_inputs)

        def model_apply(x, t, **kw):
            return self.model.apply(self.params, x, t, **kw)

        init = None
        if init_audio is not None:
            init = np.asarray(_to_mono_batch(np.asarray(init_audio)))
            # pad/crop to sample_size (the reference gradio flow does
            # the same; a different-length init would shape-mismatch
            # the sampler's noise)
            t = init.shape[-1]
            if t < self.sample_size:
                init = np.pad(init, [(0, 0)] * (init.ndim - 1)
                              + [(0, self.sample_size - t)])
            elif t > self.sample_size:
                init = init[..., :self.sample_size]
            init = jnp.broadcast_to(
                jnp.asarray(init),
                (batch, self.io_channels, self.sample_size))
        mask_args = None
        if inpaint_mask is not None:
            m = jnp.asarray(inpaint_mask, jnp.float32)
            if m.ndim == 3:  # per-batch (B, 1, L) masks pass through
                pass
            else:
                m = m.reshape(1, 1, -1)
            mask_args = {"mask": jnp.broadcast_to(
                m, (batch, 1, m.shape[-1]))}

        return np.asarray(generate_diffusion_cond(
            model_apply, jax.random.PRNGKey(seed), steps=int(steps),
            cfg_scale=float(cfg_scale), batch_size=batch,
            sample_size=self.sample_size, io_channels=self.io_channels,
            cond_inputs=self.routing.gather(cond),
            init_audio=init, init_noise_level=float(init_noise_level),
            mask_args=mask_args, sampler_type=sampler_type))


@dataclasses.dataclass
class LMApp:
    """LM tab backend (reference: gradio.py:169-202 generate_lm): sample
    tokens with temperature/top-k/top-p, decode through the codec."""

    lm: Any
    lm_params: Any
    decode_tokens: Optional[Callable] = None  # codes -> audio
    fs: int = 8000

    def process(self, length: int = 64, temperature: float = 1.0,
                top_k: int = 250, top_p: float = 0.0,
                seed: int = 0) -> np.ndarray:
        from ditsep_tpu.models.lm import lm_generate

        codes = lm_generate(self.lm, self.lm_params,
                            jax.random.PRNGKey(seed), 1, int(length),
                            temperature=float(temperature),
                            top_k=int(top_k), top_p=float(top_p))
        if self.decode_tokens is None:
            return np.asarray(codes)
        return _peak_norm(np.asarray(self.decode_tokens(codes)))


def spectrogram_preview(wav: np.ndarray, fs: int = 8000):
    """Matplotlib spectrogram figure for UI previews
    (reference: interface/aeiou.py audio_spectrogram_image)."""
    from ditsep_tpu.viz import spectrogram_image

    return spectrogram_image(np.asarray(wav).reshape(-1), fs=fs)
