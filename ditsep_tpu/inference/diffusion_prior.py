"""Diffusion priors: mono-to-stereo generation.

TPU-native counterpart of the reference's diffusion prior wrapper
(reference: src/stable_audio_tools/models/diffusion_prior.py:16-78
``MonoToStereoDiffusionPrior.stereoize``): condition a stereo diffusion
model on the dual-mono copy of the input (routed as input-concat
channels) and sample the stereo field.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ditsep_tpu.inference.generation import generate_diffusion_cond

Array = jax.Array


def stereoize(
    model_apply,
    key: Array,
    audio: Array,
    *,
    steps: int = 50,
    min_input_length: int = 1,
    pretransform=None,
    sampler_kwargs: Optional[Dict[str, Any]] = None,
) -> Array:
    """Generate stereo audio from mono with a pretrained diffusion prior.

    Args:
      model_apply: `(x, t, **cond) -> pred` closure over params (the same
        contract as generate_diffusion_cond).
      audio: (B, C, T) input; averaged to mono and duplicated to the
        dual-mono conditioning pair (reference: diffusion_prior.py:60-66).
      min_input_length: model hop granularity; input pads up to it.
      pretransform: optional latent codec (conditioning and output run in
        its latent space).
    Returns (B, 2, T) stereo audio.
    """
    b, _, t = audio.shape
    pad = (min_input_length - t % min_input_length) % min_input_length
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, 0), (0, pad)))
    dual_mono = jnp.repeat(audio.mean(axis=1, keepdims=True), 2, axis=1)
    cond_source = (pretransform.encode(dual_mono)
                   if pretransform is not None else dual_mono)

    out = generate_diffusion_cond(
        model_apply, key, steps=steps, batch_size=b,
        sample_size=audio.shape[-1],
        io_channels=cond_source.shape[1],
        cond_inputs={"input_concat_cond": cond_source},
        pretransform=pretransform,
        **(sampler_kwargs or {}))
    return out[..., :t]
