"""Latent bottlenecks: VAE, Tanh, Wasserstein (MMD), L2, residual VQ, FSQ.

TPU-native re-design of the stable-audio-tools bottleneck zoo
(reference: src/stable_audio_tools/models/bottleneck.py:33-435). The VAE
bottleneck used by the shipped configs lives in ditsep_tpu.models.oobleck
(vae_sample); this module adds the rest of the family for capability
parity. All bottlenecks are functional: encode(key, x) -> (latents, info),
decode(x) -> latents, with x (B, C, T) channel-first like the reference.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.oobleck import vae_sample

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class TanhBottleneck:
    """(reference: bottleneck.py:33-55)."""

    scale: float = 1.0

    def encode(self, key, x, return_info=False):
        y = jnp.tanh(x / self.scale) * self.scale
        return (y, {}) if return_info else y

    def decode(self, x):
        return x


@dataclasses.dataclass(frozen=True)
class VAEBottleneck:
    """(reference: bottleneck.py:57-86). x carries 2*latent_dim channels
    (mean, scale)."""

    def encode(self, key, x, return_info=False):
        mean, scale = jnp.split(x, 2, axis=1)
        if key is None:
            latents, kl = mean, jnp.zeros((), x.dtype)
        else:
            # vae_sample works channel-last; transpose around it
            lat, kl = vae_sample(key, jnp.swapaxes(mean, 1, -1),
                                 jnp.swapaxes(scale, 1, -1))
            latents = jnp.swapaxes(lat, 1, -1)
        return (latents, {"kl": kl}) if return_info else latents

    def decode(self, x):
        return x


def compute_mmd(key: Array, latents: Array) -> Array:
    """Gaussian-kernel MMD against a standard normal
    (reference: bottleneck.py:88-101)."""
    z = jnp.swapaxes(latents, 1, -1).reshape(-1, latents.shape[1])
    noise = jax.random.normal(key, z.shape, z.dtype)

    def mean_kernel(a, b):
        d = jnp.mean((a[:, None] - b[None]) ** 2, axis=2) / a.shape[-1]
        return jnp.mean(jnp.exp(-d))

    return (mean_kernel(z, z) + mean_kernel(noise, noise)
            - 2 * mean_kernel(z, noise))


@dataclasses.dataclass(frozen=True)
class WassersteinBottleneck:
    """(reference: bottleneck.py:103-139)."""

    noise_augment_dim: int = 0
    bypass_mmd: bool = False
    use_tanh: bool = False
    tanh_scale: float = 5.0

    def encode(self, key, x, return_info=False, training=True):
        info = {}
        if training and return_info:
            info["mmd"] = (jnp.zeros(()) if self.bypass_mmd
                           else compute_mmd(key, x))
        if self.use_tanh:
            x = jnp.tanh(x / self.tanh_scale) * self.tanh_scale
        return (x, info) if return_info else x

    def decode(self, x, key: Optional[Array] = None):
        if self.noise_augment_dim > 0:
            assert key is not None
            noise = jax.random.normal(
                key, (x.shape[0], self.noise_augment_dim, x.shape[-1]),
                x.dtype)
            x = jnp.concatenate([x, noise], axis=1)
        return x


@dataclasses.dataclass(frozen=True)
class L2Bottleneck:
    """Unit-normalize over the channel axis (reference:
    bottleneck.py:140-155)."""

    def encode(self, key, x, return_info=False):
        y = x / jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True),
                         min=1e-12)
        return (y, {}) if return_info else y

    def decode(self, x):
        return x / jnp.clip(jnp.linalg.norm(x, axis=1, keepdims=True),
                            min=1e-12)


class ResidualVQ(nn.Module):
    """Residual vector quantizer with straight-through gradients and
    commitment loss (the vector_quantize_pytorch.ResidualVQ capability the
    reference wraps, reference: bottleneck.py:157-186). Codebooks are
    learned parameters updated by the commitment/codebook losses (gradient
    codebook learning rather than EMA -- TPU-friendlier: no in-place
    buffer updates inside jit)."""

    dim: int
    codebook_size: int = 1024
    num_quantizers: int = 4
    commitment_weight: float = 0.25

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        """x: (B, N, D). Returns (quantized, indices (B,N,Q), loss)."""
        residual = x
        quantized = jnp.zeros_like(x)
        indices = []
        loss = 0.0
        for q in range(self.num_quantizers):
            codebook = self.param(
                f"codebook_{q}", nn.initializers.normal(1.0),
                (self.codebook_size, self.dim))
            d = (jnp.sum(residual ** 2, -1, keepdims=True)
                 - 2 * residual @ codebook.T
                 + jnp.sum(codebook ** 2, -1)[None, None, :])
            idx = jnp.argmin(d, axis=-1)  # (B, N)
            sel = codebook[idx]  # (B, N, D)
            # codebook loss + commitment loss
            loss = loss + jnp.mean((jax.lax.stop_gradient(residual) - sel)
                                   ** 2)
            loss = loss + self.commitment_weight * jnp.mean(
                (residual - jax.lax.stop_gradient(sel)) ** 2)
            # straight-through
            sel_st = residual + jax.lax.stop_gradient(sel - residual)
            quantized = quantized + sel_st
            residual = residual - jax.lax.stop_gradient(sel)
            indices.append(idx)
        return quantized, jnp.stack(indices, axis=-1), loss

    def from_indices(self, params, indices: Array) -> Array:
        out = 0.0
        for q in range(self.num_quantizers):
            codebook = params["params"][f"codebook_{q}"]
            out = out + codebook[indices[..., q]]
        return out


@dataclasses.dataclass(frozen=True)
class RVQBottleneck:
    """(reference: bottleneck.py:157-186). Holds a ResidualVQ module; pass
    its variables explicitly (functional style)."""

    quantizer: ResidualVQ

    def encode(self, variables, x, return_info=False):
        y = jnp.swapaxes(x, 1, -1)  # (B, N, D)
        q, idx, loss = self.quantizer.apply(variables, y)
        q = jnp.swapaxes(q, 1, -1)
        info = {"quantizer_indices": idx, "quantizer_loss": loss}
        return (q, info) if return_info else q

    def decode(self, x):
        return x

    def decode_tokens(self, variables, codes):
        lat = self.quantizer.from_indices(variables, codes)
        return jnp.swapaxes(lat, 1, -1)


def _round_ste(z: Array) -> Array:
    return z + jax.lax.stop_gradient(jnp.round(z) - z)


@dataclasses.dataclass(frozen=True)
class FSQBottleneck:
    """Finite scalar quantization (Mentzer et al. 2023)
    (reference: bottleneck.py:332-376). `levels` per latent dim."""

    levels: Sequence[int] = (8, 5, 5, 5)

    def _bound(self, z: Array) -> Array:
        lv = jnp.asarray(self.levels, z.dtype)
        half_l = (lv - 1.0) / 2.0
        offset = jnp.where(jnp.asarray(self.levels) % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / jnp.maximum(half_l, 1e-6))
        return jnp.tanh(z + shift) * half_l - offset

    def encode(self, key, x, return_info=False):
        """x: (B, D, T) with D == len(levels); output in ~[-1, 1]."""
        z = jnp.swapaxes(x, 1, -1)
        q = _round_ste(self._bound(z))
        half_width = jnp.asarray(
            [l // 2 for l in self.levels], z.dtype)
        q = q / half_width
        q = jnp.swapaxes(q, 1, -1)
        info = {}
        return (q, info) if return_info else q

    def decode(self, x):
        return x

    def tokens(self, q_normalized: Array) -> Array:
        """Pack normalized codes into integer tokens."""
        z = jnp.swapaxes(q_normalized, 1, -1)
        lv = jnp.asarray(self.levels)
        half_width = jnp.asarray([l // 2 for l in self.levels], z.dtype)
        digits = (jnp.round(z * half_width)
                  + (lv // 2)).astype(jnp.int32)
        basis = jnp.cumprod(jnp.concatenate(
            [jnp.ones((1,), jnp.int32), lv[:-1]]))
        return jnp.sum(digits * basis, axis=-1)
