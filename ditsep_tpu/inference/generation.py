"""Conditional generation orchestration.

Re-design of stable-audio-tools generation
(reference: src/stable_audio_tools/inference/generation.py:12-429
generate_diffusion_cond): prepare conditioning, optional init audio
(variations) and inpainting masks, pick the sampler by objective, decode
through the pretransform.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ditsep_tpu.inference.sampling import (
    get_bmask, sample, sample_k, sample_rf,
)

Array = jax.Array


def generate_diffusion_cond(
    model_apply: Callable[..., Array],
    key: Array,
    *,
    steps: int = 100,
    cfg_scale: float = 6.0,
    batch_size: int = 1,
    sample_size: int = 2097152,
    io_channels: int = 64,
    cond_inputs: Optional[Dict[str, Array]] = None,
    negative_cond_inputs: Optional[Dict[str, Array]] = None,
    init_audio: Optional[Array] = None,
    init_noise_level: float = 1.0,
    mask_args: Optional[Dict[str, Any]] = None,
    diffusion_objective: str = "v",
    sampler_type: Optional[str] = None,
    pretransform=None,
    scale_phi: float = 0.0,
) -> Array:
    """Sample latents (or audio) from a conditional diffusion model.

    `model_apply(x, t, **cond_inputs)` must already close over params and
    apply CFG internally (DiffusionTransformer.__call__ signature).
    """
    k_noise, k_samp = jax.random.split(key)
    latent_len = sample_size
    if pretransform is not None:
        latent_len = sample_size // pretransform.downsampling_ratio
        io_channels = pretransform.encoded_channels
    noise = jax.random.normal(
        k_noise, (batch_size, io_channels, latent_len))

    cond = dict(cond_inputs or {})
    if negative_cond_inputs:
        cond.update({f"negative_{k}": v
                     for k, v in negative_cond_inputs.items()})
    cond["cfg_scale"] = cfg_scale
    cond["scale_phi"] = scale_phi

    init_latent = None
    if init_audio is not None:
        init_latent = (pretransform.encode(init_audio)
                       if pretransform is not None else init_audio)

    def model_fn(x, t, **extra):
        return model_apply(x, t, **cond, **extra)

    if diffusion_objective == "rectified_flow":
        out = sample_rf(model_fn, noise, init_data=init_latent,
                        steps=steps,
                        sampler_type=sampler_type or "euler",
                        sigma_max=init_noise_level
                        if init_latent is not None else 1.0)
    elif sampler_type == "k-heun":
        out = sample_k(model_fn, noise, steps=steps,
                       init_data=init_latent)
    else:
        if init_latent is not None:
            # variation: blend init and noise at the starting sigma
            t0 = min(init_noise_level, 1.0)
            import math
            alpha0 = math.cos(t0 * math.pi / 2)
            sigma0 = math.sin(t0 * math.pi / 2)
            noise = init_latent * alpha0 + noise * sigma0
            out = sample(model_fn, noise, k_samp, steps, eta=0.0,
                         sigma_max=t0)
        else:
            out = sample(model_fn, noise, k_samp, steps, eta=0.0)

    if mask_args is not None and init_latent is not None:
        # hard inpainting at the end: keep init content where mask=0,
        # generated content where mask=1 (the per-step soft schedule is
        # available via get_bmask inside custom loops, reference:
        # sampling.py:230-248; get_bmask at the LAST step is all-ones by
        # construction, so the final blend must use the mask itself)
        mask = mask_args["mask"]  # (B, 1, latent_len) in [0, 1]
        out = init_latent * (1 - mask) + out * mask

    if pretransform is not None:
        out = pretransform.decode(out)
    return out


def build_mask(sample_size: int, mask_args: Dict[str, Any]) -> Array:
    """Percentage-based inpainting mask with hann-softened edges and
    marination (reference: inference/generation.py:412-429 build_mask).
    Keys: maskstart/maskend/softnessL/softnessR in percent, marination in
    [0, 1). Returns (sample_size,) in [0, 1]; 1 = regenerate."""
    import math

    maskstart = math.floor(mask_args["maskstart"] / 100.0 * sample_size)
    maskend = math.ceil(mask_args["maskend"] / 100.0 * sample_size)
    softness_l = round(mask_args.get("softnessL", 0) / 100.0 * sample_size)
    softness_r = round(mask_args.get("softnessR", 0) / 100.0 * sample_size)
    marination = mask_args.get("marination", 0)
    mask = jnp.zeros((sample_size,))
    mask = mask.at[maskstart:maskend].set(1.0)
    # torch.hann_window(2s, periodic=False) == jnp.hanning(2s)
    if softness_l > 0:
        hann_l = jnp.hanning(2 * softness_l)[:softness_l]
        mask = mask.at[maskstart:maskstart + softness_l].set(hann_l)
    if softness_r > 0:
        hann_r = jnp.hanning(2 * softness_r)[softness_r:]
        mask = mask.at[maskend - softness_r:maskend].set(hann_r)
    if marination > 0:
        mask = mask * (1 - marination)
    return mask
