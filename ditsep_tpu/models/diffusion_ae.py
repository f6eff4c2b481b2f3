"""Diffusion autoencoder: deterministic encoder + diffusion decoder.

Re-design of the stable-audio-tools diffusion_autoencoder model type
(reference: src/stable_audio_tools/models/autoencoders.py
create_diffAE_from_config and models/diffusion.py DiffusionAutoencoder):
an encoder maps audio to a compact latent; a diffusion model reconstructs
the audio conditioned on that latent via input-concat; decoding runs the
v-objective sampler.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ditsep_tpu.inference.sampling import sample

Array = jax.Array


class NCWEncoder:
    """Layout adapter: wraps an NWC Flax encoder (e.g. OobleckEncoder,
    (B, T, C) -> (B, T/hop, D)) behind the channel-first (B, C, T) ->
    (B, D, T/hop) contract DiffusionAutoencoder expects (the reference
    encoders are all channel-first, autoencoders.py:285-316)."""

    def __init__(self, inner):
        self.inner = inner

    def init(self, key, audio: Array):
        return self.inner.init(key, jnp.swapaxes(audio, 1, 2))

    def apply(self, params, audio: Array) -> Array:
        out = self.inner.apply(params, jnp.swapaxes(audio, 1, 2))
        return jnp.swapaxes(out, 1, 2)


@dataclasses.dataclass(frozen=True)
class DiffusionAutoencoder:
    """Functional wrapper: `encoder` is a Flax module (B, C, T) ->
    (B, D, T/hop); `diffusion` predicts v given (x (B, C, T), t,
    input_concat_cond=latent-upsampled)."""

    encoder: Any
    diffusion: Any
    latent_dim: int
    downsampling_ratio: int
    io_channels: int = 1

    def encode(self, enc_params, audio: Array) -> Array:
        return self.encoder.apply(enc_params, audio)

    def _cond(self, latents: Array, t_len: int) -> Array:
        reps = -(-t_len // latents.shape[-1])
        return jnp.repeat(latents, reps, axis=-1)[..., :t_len]

    def diffusion_input(self, diff_params, noised: Array, t: Array,
                        latents: Array) -> Array:
        """Concat the (nearest-upsampled) latent onto the channel axis --
        the diffusion net is built with io_channels covering the audio
        channels and input channels audio+latent."""
        cond = self._cond(latents, noised.shape[-1])
        x = jnp.concatenate([noised, cond], axis=1)
        return self.diffusion.apply(diff_params, x, t)

    def decode(self, diff_params, key: Array, latents: Array,
               steps: int = 50) -> Array:
        t_len = latents.shape[-1] * self.downsampling_ratio
        noise = jax.random.normal(
            key, (latents.shape[0], self.io_channels, t_len))
        model_fn = lambda x, t, **kw: self.diffusion_input(
            diff_params, x, t, latents)
        return sample(model_fn, noise, None, steps=steps, eta=0.0)

    def reconstruct(self, enc_params, diff_params, key: Array,
                    audio: Array, steps: int = 50) -> Array:
        latents = self.encode(enc_params, audio)
        return self.decode(diff_params, key, latents, steps=steps)
