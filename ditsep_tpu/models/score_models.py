"""Score-model wrappers around the NCSN++ backbone.

TPU-native re-design of the reference score models
(reference: src/models/diffsep/score_models.py:10-186).

The STFT front-end runs as MXU matmuls (ditsep_tpu.ops.stft) and the whole
pre-process -> U-Net -> post-process chain is one jittable function with
static shapes, so a 30-step sampler scan compiles to a single XLA program.
Internals are channel-last (NHWC); the public API is channel-first
waveforms/latents (B, C, T) matching the reference call convention.
"""
from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.ncsnpp import NCSNpp
from ditsep_tpu.ops import stft as _stft, istft as _istft

Array = jax.Array


def _mag_rescale(spec: Array, new_mag_over_mag) -> Array:
    """Rescale a complex spectrogram's magnitude, keeping phase:
    ``|s| -> f(|s|)`` computed as ``s * f(|s|)/|s|``.

    The reference computes ``f(|s|) * exp(1j*angle(s))``
    (reference: score_models.py:41-70); multiplying by the ratio instead
    avoids atan2 + complex-exp (slower VPU transcendentals, and the
    atan2/exp composition is unimplemented in the experimental TPU
    backend). At s=0 both definitions give 0; we guard the ratio there."""
    mag = jnp.abs(spec)
    safe = jnp.maximum(mag, 1e-20)
    ratio = new_mag_over_mag(safe)
    return spec * jnp.where(mag > 0, ratio, 0.0)


def _spec_transform_forward(spec: Array, transform: str, exponent: float,
                            factor: float) -> Array:
    """Magnitude-compression transform (reference: score_models.py:41-57).

    Reference quirk reproduced: the 'exponent' branch multiplies by the
    SIGNED factor forward but divides by abs(factor) backward (reference
    :48 vs :61), so a negative spec_factor is not round-trip-invertible
    there either. All shipped configs use positive factors."""
    if transform == "exponent":
        if exponent != 1.0:
            e = abs(exponent)
            spec = _mag_rescale(spec, lambda m: m ** (e - 1.0))
        return spec * factor
    if transform == "log":
        spec = _mag_rescale(spec, lambda m: jnp.log1p(m) / m)
        return spec * abs(factor)
    if transform == "none":
        return spec
    raise ValueError("transform must be one of 'exponent'|'log'|'none'")


def _spec_transform_backward(spec: Array, transform: str, exponent: float,
                             factor: float) -> Array:
    """Inverse transform (reference: score_models.py:59-70)."""
    if transform == "exponent":
        spec = spec / abs(factor)
        if exponent != 1.0:
            e = abs(exponent)
            spec = _mag_rescale(spec, lambda m: m ** (1.0 / e - 1.0))
        return spec
    if transform == "log":
        spec = spec / abs(factor)
        return _mag_rescale(spec, lambda m: (jnp.exp(m) - 1.0) / m)
    if transform == "none":
        return spec
    raise ValueError("transform must be one of 'exponent'|'log'|'none'")


class ScoreModelNCSNpp(nn.Module):
    """STFT-domain score network (reference: score_models.py:10-138).

    forward(xt, time_cond, mix): concat channels -> pad -> STFT ->
    magnitude compression -> re/im channels -> pad frames %64 -> NCSN++ ->
    inverse of everything. Backbone channels: in 2*n_src+2, out 2*n_src.
    """

    num_sources: int = 2
    n_fft: int = 510
    hop_length: int = 128
    transform: str = "exponent"
    spec_abs_exponent: float = 0.5
    spec_factor: float = 0.15
    # backbone config (subset that the shipped configs touch)
    nf: int = 64
    ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resamp_with_conv: bool = True
    image_size: int = 256
    centered: bool = False
    dropout: float = 0.0
    fir: bool = True  # FIR (vs naive) resampling in the backbone
    # padding-robust mode (extension beyond the reference): mask the %64
    # frame pad (and, when per-item `lengths` are passed, each item's
    # trailing quiet region) out of every GroupNorm statistic and
    # attention row. Removes the length-dependent quality dilution
    # measured in docs/pad_dilution_r03.md. Keep False for exact
    # reference semantics / imported reference checkpoints.
    mask_padding: bool = False
    dtype: Any = None

    def setup(self):
        self.backbone = NCSNpp(
            nf=self.nf, ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            resamp_with_conv=self.resamp_with_conv,
            image_size=self.image_size, centered=self.centered,
            dropout=self.dropout, fir=self.fir,
            num_channels_in=2 * self.num_sources + 2,
            num_channels_out=2 * self.num_sources,
            dtype=self.dtype, name="backbone",
        )

    # -- spectral pre/post-processing (channel-last) ------------------------
    def pre_process(self, x: Array) -> Tuple[Array, int, int]:
        """(B, C, T) waveform -> (B, F, frames, 2C) real NHWC tensor.
        Returns (spec_real, n_samples, frame_pad)."""
        n_samples = x.shape[-1]
        pad = self.n_fft - self.hop_length
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        spec = _stft(x, self.n_fft, self.hop_length)  # (B, C, F, T)
        spec = _spec_transform_forward(
            spec, self.transform, self.spec_abs_exponent, self.spec_factor)
        spec = jnp.transpose(spec, (0, 2, 3, 1))  # (B, F, T, C)
        h = jnp.concatenate([spec.real, spec.imag], axis=-1)  # (B,F,T,2C)
        n_frames = h.shape[2]
        rem = n_frames % 64
        n_pad = 0 if rem == 0 else 64 - rem
        if n_pad:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, n_pad), (0, 0)))
        return h, n_samples, n_pad

    def post_process(self, h: Array, n_samples: int, n_pad: int) -> Array:
        """(B, F, frames, 2C) -> (B, C, T) waveform."""
        h = h.astype(jnp.float32)  # spectral inverse runs f32 (complex64)
        if n_pad:
            h = h[:, :, :-n_pad, :]
        c = h.shape[-1] // 2
        spec = jax.lax.complex(h[..., :c], h[..., c:])  # (B, F, T, C)
        spec = _spec_transform_backward(
            spec, self.transform, self.spec_abs_exponent, self.spec_factor)
        spec = jnp.transpose(spec, (0, 3, 1, 2))  # (B, C, F, T)
        x = _istft(spec, self.n_fft, self.hop_length, length=n_samples)
        return x

    def __call__(self, xt: Array, time_cond: Array, mix: Array, *,
                 train: bool = False, lengths: Array = None) -> Array:
        """xt (B, n_src, T), time_cond (B,), mix (B, 1, T) -> (B, n_src, T).

        ``lengths`` (B,) int: valid sample count per item (≤ T), for
        mask_padding mode — frames beyond each item's own STFT coverage
        are masked out of normalization/attention statistics, so batch
        padding no longer perturbs the scores of shorter items."""
        x = jnp.concatenate([xt, mix], axis=1)
        h, n_samples, n_pad = self.pre_process(x)
        time_mask = None
        if self.mask_padding:
            n_frames = h.shape[2]
            t_idx = jnp.arange(n_frames)
            if lengths is None:
                # static mask: only the %64 frame pad is invalid
                time_mask = jnp.broadcast_to(
                    t_idx < (n_frames - n_pad), (h.shape[0], n_frames))
            else:
                from ditsep_tpu.ops.stft import n_frames_prepadded
                frames_valid = n_frames_prepadded(
                    lengths, self.n_fft, self.hop_length)
                time_mask = t_idx[None, :] < frames_valid[:, None]
        h = self.backbone(h, time_cond, train=train, time_mask=time_mask)
        return self.post_process(h, n_samples, n_pad)


class LatentScoreModelNCSNpp(nn.Module):
    """Latent-domain score network (reference: score_models.py:140-186).
    Operates on (B, n_src, latent_dim, T_latent); latent_dim is the U-Net
    'height'."""

    num_sources: int = 2
    max_latent_length: int = 4
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (16,)
    resamp_with_conv: bool = True
    image_size: int = 64
    centered: bool = True
    dropout: float = 0.0
    # padding-robust mode, as in ScoreModelNCSNpp: at typical 4 s / hop
    # 2048 lengths the %max_latent_length pad is up to ~3 of ~16 latent
    # frames — a LARGER statistics dilution than the waveform model's
    # %64 pad (docs/pad_dilution_r03.md). `lengths` here are counts of
    # valid LATENT frames per item.
    mask_padding: bool = False
    dtype: Any = None

    def setup(self):
        self.backbone = NCSNpp(
            nf=self.nf, ch_mult=tuple(self.ch_mult),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.attn_resolutions),
            resamp_with_conv=self.resamp_with_conv,
            image_size=self.image_size, centered=self.centered,
            dropout=self.dropout,
            num_channels_in=self.num_sources + 1,
            num_channels_out=self.num_sources,
            dtype=self.dtype, name="backbone",
        )

    def __call__(self, xt: Array, time_cond: Array, mix: Array, *,
                 train: bool = False, lengths: Array = None) -> Array:
        """xt (B, n_src, D, Tl), mix (B, 1, D, Tl) -> (B, n_src, D, Tl).
        ``lengths`` (B,) int: valid latent-frame count per item (≤ Tl),
        for mask_padding mode."""
        x = jnp.concatenate([xt, mix], axis=1)  # (B, n_src+1, D, Tl)
        n_t = x.shape[-1]
        rem = n_t % self.max_latent_length
        n_pad = 0 if rem == 0 else self.max_latent_length - rem
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, n_pad)))
        time_mask = None
        if self.mask_padding:
            t_idx = jnp.arange(n_t + n_pad)
            if lengths is None:
                time_mask = jnp.broadcast_to(
                    t_idx < n_t, (x.shape[0], n_t + n_pad))
            else:
                time_mask = t_idx[None, :] < lengths[:, None]
        h = jnp.transpose(x, (0, 2, 3, 1))  # (B, D, Tl, C)
        h = self.backbone(h, time_cond, train=train, time_mask=time_mask)
        h = jnp.transpose(h, (0, 3, 1, 2))  # (B, C, D, Tl)
        if n_pad:
            h = h[..., :-n_pad]
        return h
