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


@dataclasses.dataclass(frozen=True)
class RVQVAEBottleneck:
    """VAE reparameterization followed by residual VQ (reference:
    bottleneck.py:187-219). The incoming latent carries 2*dim channels
    (mean, scale); a VAE sample is drawn first (KL reported in info),
    then quantized by the residual VQ."""

    quantizer: ResidualVQ

    def encode(self, variables, key, x, return_info=False):
        mean, scale = jnp.split(x, 2, axis=1)
        lat, kl = vae_sample(key, jnp.swapaxes(mean, 1, -1),
                             jnp.swapaxes(scale, 1, -1))
        q, idx, loss = self.quantizer.apply(variables, lat)
        q = jnp.swapaxes(q, 1, -1)
        info = {"kl": kl, "quantizer_indices": idx,
                "quantizer_loss": jnp.mean(loss)}
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


@dataclasses.dataclass(frozen=True)
class DitheredFSQ:
    """Dithered finite scalar quantization (reference: fsq.py:26-131).
    Parameter-free: levels per latent dim, optionally replicated across
    ``num_codebooks`` groups along the channel axis. Training draws two
    per-sample Bernoulli(noise_dropout) masks: the first keeps the
    continuous value instead of rounding, the second replaces the result
    with a uniformly dithered value z + U(-.5,.5)*half_l (the reference's
    quantize, fsq.py:64-77)."""

    levels: Sequence[int]
    num_codebooks: int = 1
    noise_dropout: float = 0.5
    scale: float = 1.0

    @property
    def codebook_dim(self) -> int:
        return len(self.levels)

    @property
    def codebook_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out

    def _half_l(self, dtype) -> Array:
        lv = jnp.asarray(self.levels, dtype)
        return self.scale * 2.0 / (lv - 1.0)

    def _scale_and_shift(self, z: Array) -> Array:
        return (z + self.scale) / self._half_l(z.dtype)

    def _scale_and_shift_inverse(self, li: Array) -> Array:
        return li * self._half_l(li.dtype) - self.scale

    def quantize(self, key: Optional[Array], z: Array,
                 training: bool = False, skip_tanh: bool = False) -> Array:
        """z: (..., B leading, d) already grouped per codebook."""
        if not skip_tanh:
            z = jnp.tanh(z)
        rounded = self._scale_and_shift_inverse(
            _round_ste(self._scale_and_shift(z)))
        if not training:
            return rounded
        assert key is not None, "training quantize needs a PRNG key"
        k1, k2, k3 = jax.random.split(key, 3)
        b = z.shape[0]
        mshape = (b,) + (1,) * (z.ndim - 1)
        keep = jax.random.bernoulli(k1, self.noise_dropout, mshape)
        q = jnp.where(keep, z, rounded)
        dither = z + (jax.random.uniform(k3, z.shape, z.dtype) - 0.5) \
            * self._half_l(z.dtype)
        keep2 = jax.random.bernoulli(k2, self.noise_dropout, mshape)
        return jnp.where(keep2, q, dither)

    def _basis(self) -> Array:
        lv = list(self.levels)
        return jnp.cumprod(jnp.asarray([1] + lv[:-1], jnp.int32))

    def codes_to_indices(self, zhat: Array) -> Array:
        """zhat: (..., d) rounded codes -> integer indices (...)."""
        li = jnp.round(self._scale_and_shift(zhat)).astype(jnp.int32)
        return jnp.sum(li * self._basis(), axis=-1)

    def indices_to_codes(self, indices: Array) -> Array:
        """indices: (..., c) -> codes (..., c*d)."""
        li = (indices[..., None] // self._basis()) \
            % jnp.asarray(self.levels, jnp.int32)
        codes = self._scale_and_shift_inverse(li.astype(jnp.float32))
        return codes.reshape(codes.shape[:-2] + (-1,))

    def __call__(self, key: Optional[Array], z: Array,
                 training: bool = False,
                 skip_tanh: bool = False) -> Tuple[Array, Array]:
        """z: (B, N, c*d) -> (codes (B, N, c*d), indices (B, N, c))."""
        b, n, dim = z.shape
        assert dim == self.num_codebooks * self.codebook_dim
        zc = z.reshape(b, n, self.num_codebooks, self.codebook_dim)
        codes = self.quantize(key, zc.astype(jnp.float32),
                              training=training, skip_tanh=skip_tanh)
        # indices are computed from the *rounded* lattice point even when
        # the training path emitted a dithered/continuous code
        # (reference computes them from the quantize output; at eval the
        # two coincide, which is when tokens are consumed)
        rounded = self._scale_and_shift_inverse(
            jnp.round(self._scale_and_shift(codes)))
        idx = self.codes_to_indices(rounded)
        return codes.reshape(b, n, dim).astype(z.dtype), idx


@dataclasses.dataclass(frozen=True)
class DitheredFSQBottleneck:
    """(reference: bottleneck.py:378-435). ``levels`` may be an int
    (replicated over ``dim`` dims) or a per-dim list of length ``dim``."""

    quantizer: DitheredFSQ

    @staticmethod
    def build(dim: int, levels, num_codebooks: int = 1,
              dither_inference: bool = True, noise_dropout: float = 0.05):
        if isinstance(levels, int):
            qlevels = [levels] * dim
        else:
            if len(levels) != dim:
                raise ValueError(
                    f"Length of levels list ({len(levels)}) must match "
                    f"dim ({dim}).")
            qlevels = list(levels)
        return DitheredFSQBottleneck(DitheredFSQ(
            levels=tuple(qlevels), num_codebooks=num_codebooks,
            noise_dropout=noise_dropout))

    def encode(self, key, x, return_info=False, training=False):
        z = jnp.swapaxes(x, 1, -1)
        q, idx = self.quantizer(key, z, training=training)
        q = jnp.swapaxes(q, 1, -1)
        info = {"quantizer_indices": jnp.swapaxes(idx, 1, -1)}
        return (q, info) if return_info else q

    def decode(self, x):
        return x

    def decode_tokens(self, tokens):
        """tokens: (B, c, N) -> latents (B, c*d, N)."""
        codes = self.quantizer.indices_to_codes(
            jnp.swapaxes(tokens, 1, -1))
        return jnp.swapaxes(codes, 1, -1)


class DACResidualVQ(nn.Module):
    """DAC-style residual VQ (the dac.nn.quantize.ResidualVectorQuantize
    the reference wraps, reference: bottleneck.py:221-325): each stage
    projects the residual to a small codebook dim, looks up the nearest
    L2-NORMALISED code (cosine distance), and projects back; commitment
    and codebook losses are returned separately. Gradient codebook
    learning (no EMA buffers -- jit-friendly)."""

    input_dim: int
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8

    @nn.compact
    def __call__(self, x: Array, n_quantizers: Optional[int] = None):
        """x: (B, N, D_in) channel-last. Returns
        (z, codes (B,N,Q), latents (B,N,Q*cd), commitment, codebook)."""
        n_q = self.n_codebooks if n_quantizers is None \
            else min(n_quantizers, self.n_codebooks)
        residual = x
        z = jnp.zeros_like(x)
        codes = []
        latents = []
        commit = 0.0
        codebook_loss = 0.0
        for q in range(n_q):
            zq = nn.Dense(self.codebook_dim, name=f"in_proj_{q}")(residual)
            cb = self.param(f"codebook_{q}", nn.initializers.normal(1.0),
                            (self.codebook_size, self.codebook_dim))
            zn = zq / (jnp.linalg.norm(zq, axis=-1, keepdims=True) + 1e-8)
            cn = cb / (jnp.linalg.norm(cb, axis=-1, keepdims=True) + 1e-8)
            idx = jnp.argmax(zn @ cn.T, axis=-1)  # max cosine similarity
            sel = cb[idx]
            commit = commit + jnp.mean(
                (zq - jax.lax.stop_gradient(sel)) ** 2)
            codebook_loss = codebook_loss + jnp.mean(
                (jax.lax.stop_gradient(zq) - sel) ** 2)
            sel_st = zq + jax.lax.stop_gradient(sel - zq)
            out = nn.Dense(self.input_dim, name=f"out_proj_{q}")(sel_st)
            z = z + out
            residual = residual - jax.lax.stop_gradient(out)
            codes.append(idx)
            latents.append(zq)
        return (z, jnp.stack(codes, axis=-1),
                jnp.concatenate(latents, axis=-1), commit, codebook_loss)

    def from_codes(self, variables, codes: Array) -> Array:
        """codes (B, N, Q) -> reconstructed z (B, N, D_in)."""
        p = variables["params"]
        z = 0.0
        for q in range(codes.shape[-1]):
            sel = p[f"codebook_{q}"][codes[..., q]]
            w = p[f"out_proj_{q}"]["kernel"]
            b = p[f"out_proj_{q}"]["bias"]
            z = z + sel @ w + b
        return z


@dataclasses.dataclass(frozen=True)
class DACRVQBottleneck:
    """(reference: bottleneck.py:221-276). Channel-first (B, C, T) like
    every bottleneck here; per-quantizer losses are pre-divided by the
    codebook count as the reference does."""

    quantizer: DACResidualVQ
    quantize_on_decode: bool = False
    noise_augment_dim: int = 0

    def encode(self, variables, x, return_info=False,
               n_quantizers: Optional[int] = None):
        info = {"pre_quantizer": x}
        if self.quantize_on_decode:
            return (x, info) if return_info else x
        y = jnp.swapaxes(x, 1, -1)
        z, codes, latents, commit, cb = self.quantizer.apply(
            variables, y, n_quantizers=n_quantizers)
        z = jnp.swapaxes(z, 1, -1)
        info.update({
            "codes": codes,
            "latents": jnp.swapaxes(latents, 1, -1),
            "vq/commitment_loss": commit / self.quantizer.n_codebooks,
            "vq/codebook_loss": cb / self.quantizer.n_codebooks,
        })
        return (z, info) if return_info else z

    def decode(self, variables, x, key=None):
        if self.quantize_on_decode:
            y = jnp.swapaxes(x, 1, -1)
            x = jnp.swapaxes(self.quantizer.apply(variables, y)[0], 1, -1)
        if self.noise_augment_dim > 0:
            assert key is not None, "noise_augment_dim needs a PRNG key"
            noise = jax.random.normal(
                key, (x.shape[0], self.noise_augment_dim, x.shape[-1]),
                x.dtype)
            x = jnp.concatenate([x, noise], axis=1)
        return x

    def decode_tokens(self, variables, codes, key=None):
        lat = self.quantizer.from_codes(variables, codes)
        return self.decode(variables, jnp.swapaxes(lat, 1, -1), key=key)


@dataclasses.dataclass(frozen=True)
class DACRVQVAEBottleneck:
    """(reference: bottleneck.py:277-325): VAE sample of (mean, scale)
    channels THEN DAC residual VQ; kl joins the vq losses in info."""

    quantizer: DACResidualVQ
    quantize_on_decode: bool = False

    def encode(self, variables, key, x, return_info=False,
               n_quantizers: Optional[int] = None):
        mean, scale = jnp.split(x, 2, axis=1)
        lat, kl = vae_sample(key, jnp.swapaxes(mean, 1, -1),
                             jnp.swapaxes(scale, 1, -1))
        x = jnp.swapaxes(lat, 1, -1)
        info = {"pre_quantizer": x, "kl": kl}
        if self.quantize_on_decode:
            return (x, info) if return_info else x
        z, codes, latents, commit, cb = self.quantizer.apply(
            variables, lat, n_quantizers=n_quantizers)
        z = jnp.swapaxes(z, 1, -1)
        info.update({
            "codes": codes,
            "latents": jnp.swapaxes(latents, 1, -1),
            "vq/commitment_loss": commit / self.quantizer.n_codebooks,
            "vq/codebook_loss": cb / self.quantizer.n_codebooks,
        })
        return (z, info) if return_info else z

    def decode(self, variables, x):
        if self.quantize_on_decode:
            y = jnp.swapaxes(x, 1, -1)
            x = jnp.swapaxes(self.quantizer.apply(variables, y)[0], 1, -1)
        return x

    def decode_tokens(self, variables, codes):
        lat = self.quantizer.from_codes(variables, codes)
        return self.decode(variables, jnp.swapaxes(lat, 1, -1))
