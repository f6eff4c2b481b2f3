"""Pretransforms: invertible encodings applied before diffusion.

TPU-native re-design of the stable-audio-tools pretransforms
(reference: src/stable_audio_tools/models/pretransforms.py:5-275):
autoencoder (frozen VAE), wavelet (Haar cascade), patched (reshape), PQMF.
Functional style: pretransforms hold their (frozen) params explicitly.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.models.oobleck import (
    OobleckVAE, decode_audio_chunked, encode_audio_chunked,
)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AutoencoderPretransform:
    """Frozen-VAE pretransform (reference: pretransforms.py:28-90)."""

    model: OobleckVAE
    params: Any
    scale: float = 1.0
    chunked: bool = False

    @property
    def downsampling_ratio(self) -> int:
        return self.model.downsampling_ratio

    @property
    def encoded_channels(self) -> int:
        return self.model.latent_dim

    def encode(self, x: Array, key: Optional[Array] = None) -> Array:
        params = jax.tree.map(jax.lax.stop_gradient, self.params)
        if self.chunked:
            enc = encode_audio_chunked(self.model, params, x, key=key)
        else:
            enc = self.model.apply(params, x, key=key,
                                   method=self.model.encode)
        return enc / self.scale

    def decode(self, z: Array) -> Array:
        params = jax.tree.map(jax.lax.stop_gradient, self.params)
        z = z * self.scale
        if self.chunked:
            return decode_audio_chunked(self.model, params, z)
        return self.model.apply(params, z, method=self.model.decode)


def _haar_filters(dtype=np.float32):
    h = 1.0 / math.sqrt(2.0)
    lo = np.array([h, h], dtype)
    hi = np.array([h, -h], dtype)
    return lo, hi


@dataclasses.dataclass(frozen=True)
class WaveletPretransform:
    """Multi-level Haar wavelet encode/decode
    (reference: pretransforms.py:92-112 and models/wavelets.py). Each level
    halves time and doubles channels; perfect reconstruction."""

    channels: int = 1
    levels: int = 4
    wavelet: str = "haar"

    @property
    def downsampling_ratio(self) -> int:
        return 2 ** self.levels

    @property
    def encoded_channels(self) -> int:
        return self.channels * self.downsampling_ratio

    def encode(self, x: Array) -> Array:
        """(B, C, T) -> (B, C*2^L, T/2^L)."""
        assert self.wavelet == "haar", "only haar is built in"
        for _ in range(self.levels):
            b, c, t = x.shape
            pairs = x.reshape(b, c, t // 2, 2)
            lo = (pairs[..., 0] + pairs[..., 1]) / math.sqrt(2.0)
            hi = (pairs[..., 0] - pairs[..., 1]) / math.sqrt(2.0)
            x = jnp.concatenate([lo, hi], axis=1)
        return x

    def decode(self, z: Array) -> Array:
        for _ in range(self.levels):
            b, c, t = z.shape
            lo, hi = jnp.split(z, 2, axis=1)
            even = (lo + hi) / math.sqrt(2.0)
            odd = (lo - hi) / math.sqrt(2.0)
            z = jnp.stack([even, odd], axis=-1).reshape(b, c // 2, t * 2)
        return z


@dataclasses.dataclass(frozen=True)
class PatchedPretransform:
    """Time-to-channel patching (reference: pretransforms.py:110-140)."""

    channels: int = 1
    patch_size: int = 4

    @property
    def downsampling_ratio(self) -> int:
        return self.patch_size

    @property
    def encoded_channels(self) -> int:
        return self.channels * self.patch_size

    def encode(self, x: Array) -> Array:
        b, c, t = x.shape
        p = self.patch_size
        return x.reshape(b, c, t // p, p).transpose(0, 1, 3, 2).reshape(
            b, c * p, t // p)

    def decode(self, z: Array) -> Array:
        b, cp, t = z.shape
        p = self.patch_size
        c = cp // p
        return z.reshape(b, c, p, t).transpose(0, 1, 3, 2).reshape(
            b, c, t * p)


@dataclasses.dataclass(frozen=True)
class PQMFPretransform:
    """Pseudo-QMF polyphase filter bank
    (reference: pretransforms.py PQMFPretransform + models/pqmf.py).
    Near-perfect-reconstruction M-band analysis/synthesis with a
    Kaiser-windowed prototype lowpass."""

    bands: int = 8
    taps: int = 64  # prototype length = taps * bands? we use taps total
    beta: float = 9.0

    def _prototype(self) -> np.ndarray:
        n = self.taps
        m = self.bands
        cutoff = 1.0 / (2.0 * m)
        k = np.arange(n) - (n - 1) / 2
        h = 2 * cutoff * np.sinc(2 * cutoff * k)
        h *= np.kaiser(n, self.beta)
        return (h / np.sum(h)).astype(np.float32)

    def _filters(self) -> np.ndarray:
        h = self._prototype()
        n = self.taps
        m = self.bands
        k = np.arange(n)
        filts = np.zeros((m, n), np.float32)
        for b in range(m):
            phase = (-1) ** b * math.pi / 4
            filts[b] = (2 * h * np.cos(
                (2 * b + 1) * math.pi / (2 * m)
                * (k - (n - 1) / 2) + phase))
        return filts

    @property
    def downsampling_ratio(self) -> int:
        return self.bands

    def encode(self, x: Array) -> Array:
        """(B, C, T) -> (B, C*M, T/M)."""
        filts = jnp.asarray(self._filters())  # (M, taps)
        b, c, t = x.shape
        flat = x.reshape(b * c, t, 1)
        w = jnp.flip(filts.T[:, None, :], 0)  # (taps, 1, M), true conv
        pad = self.taps // 2
        y = jax.lax.conv_general_dilated(
            flat, w, window_strides=(self.bands,),
            padding=[(pad, pad - 1 + (self.taps % 2))],
            dimension_numbers=("NWC", "WIO", "NWC"))
        y = y.transpose(0, 2, 1)  # (B*C, M, T/M)
        return y.reshape(b, c * self.bands, -1)

    def decode(self, z: Array) -> Array:
        """(B, C*M, T/M) -> (B, C, T)."""
        filts = jnp.asarray(self._filters())
        m = self.bands
        b, cm, tm = z.shape
        c = cm // m
        zz = z.reshape(b * c, m, tm).transpose(0, 2, 1)  # (B*C, T/M, M)
        # synthesis: upsample each band by M and filter with the (time-
        # reversed) analysis filters, sum over bands, gain M
        w = filts.T[:, :, None] * m  # (taps, M, 1)
        pad = self.taps // 2
        y = jax.lax.conv_general_dilated(
            zz, w, window_strides=(1,),
            padding=[(pad - 1 + (self.taps % 2), pad)],
            lhs_dilation=(m,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        return y.reshape(b, c, -1)


@dataclasses.dataclass(frozen=True)
class DACPretransform:
    """TPU-native stand-in for the reference's PretrainedDACPretransform
    (reference: pretransforms.py:150-209). The reference downloads the
    pretrained descript-audio-codec and wraps it; downloads are
    unavailable here, so the same architecture is composed from the
    in-repo DAC encoder/decoder and DAC residual VQ. Weights come from
    the torch importer when a DAC checkpoint is on disk; otherwise
    params are random-init (swap via ``dataclasses.replace(pre,
    params=...)``). Public layout (B, C, T); discrete tokens (B, Q, Tl)
    like the reference's ``tokenize``."""

    encoder: Any   # codecs.DACEncoderWrapper
    decoder: Any   # codecs.DACDecoderWrapper
    quantizer: Any  # bottleneck.DACResidualVQ
    params: Any    # {"encoder": .., "decoder": .., "quantizer": ..}
    scale: float = 1.0
    quantize_on_decode: bool = True
    enable_grad: bool = False
    is_discrete: bool = True
    io_channels: int = 1

    @property
    def downsampling_ratio(self) -> int:
        return self.encoder.hop_length

    @property
    def encoded_channels(self) -> int:
        if self.encoder.latent_dim is not None:
            return self.encoder.latent_dim
        return self.encoder.d_model * 2 ** len(self.encoder.strides)

    @property
    def num_quantizers(self) -> int:
        return self.quantizer.n_codebooks

    @property
    def codebook_size(self) -> int:
        return self.quantizer.codebook_size

    def _p(self, name):
        p = self.params[name]
        if self.enable_grad:
            return p
        return jax.tree.map(jax.lax.stop_gradient, p)

    def encode(self, x: Array) -> Array:
        """(B, C, T) -> (B, D, Tl); quantizes here unless
        quantize_on_decode (reference: pretransforms.py:180-192)."""
        lat = self.encoder.apply(self._p("encoder"),
                                 jnp.swapaxes(x, -1, -2))
        if not self.quantize_on_decode:
            lat = self.quantizer.apply(self._p("quantizer"), lat)[0]
        return jnp.swapaxes(lat, -1, -2) / self.scale

    def decode(self, z: Array) -> Array:
        """(B, D, Tl) -> (B, C, T) (reference: pretransforms.py:194-202)."""
        lat = jnp.swapaxes(z * self.scale, -1, -2)
        if self.quantize_on_decode:
            lat = self.quantizer.apply(self._p("quantizer"), lat)[0]
        y = self.decoder.apply(self._p("decoder"), lat)
        return jnp.swapaxes(y, -1, -2)

    def tokenize(self, x: Array) -> Array:
        """(B, C, T) -> integer codes (B, Q, Tl)
        (reference: pretransforms.py:204-205)."""
        lat = self.encoder.apply(self._p("encoder"),
                                 jnp.swapaxes(x, -1, -2))
        codes = self.quantizer.apply(self._p("quantizer"), lat)[1]
        return jnp.swapaxes(codes, -1, -2)

    def decode_tokens(self, tokens: Array) -> Array:
        """codes (B, Q, Tl) -> audio (B, C, T)
        (reference: pretransforms.py:207-209)."""
        lat = self.quantizer.from_codes(self._p("quantizer"),
                                        jnp.swapaxes(tokens, -1, -2))
        y = self.decoder.apply(self._p("decoder"), lat)
        return jnp.swapaxes(y, -1, -2)
