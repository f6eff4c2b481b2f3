"""FACodec: factorized neural speech codec (optional codec backend).

TPU-native re-design of the vendored NaturalSpeech3 FACodec
(reference: src/models/facodec/facodec.py:159-680, quantize/fvq.py,
gradient_reversal.py:11-35, alias_free_torch/). Present in the reference as
an alternative codec OFF the main separation path (SURVEY section 2.8);
implemented here at capability level: DAC-style encoder/decoder with
snake activations, factorized VQ (projection -> l2-normalized codebook
lookup), a timbre extractor with attention pooling, and gradient-reversal
speaker disentanglement.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.oobleck import SnakeBeta, WNConv1d, WNConvTranspose1d

Array = jax.Array


@jax.custom_vjp
def gradient_reversal(x: Array, alpha: float = 1.0) -> Array:
    """Identity forward, -alpha * grad backward
    (reference: src/models/facodec/gradient_reversal.py:11-35)."""
    return x


def _gr_fwd(x, alpha):
    return x, alpha


def _gr_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_gr_fwd, _gr_bwd)


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int):
    """Windowed-sinc lowpass with the adaptive Kaiser design rule
    (reference: src/models/facodec/alias_free_torch/filter.py:27-58):
    beta follows the standard Kaiser attenuation estimate
    A = 2.285*(N-1)*pi*(4*half_width) + 7.95, and the kernel is
    normalised to unit sum. cutoff in cycles/sample (0..0.5)."""
    import numpy as np
    if not 0.0 <= cutoff <= 0.5:
        raise ValueError("cutoff must be in [0, 0.5]")
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4.0 * half_width
    a = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    h = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    return (h / h.sum()).astype(np.float32)


def _depthwise_fir(x: Array, h, stride: int = 1, lhs_dilation: int = 1,
                   pad=(0, 0)) -> Array:
    """Depthwise FIR over (B, T, C) with the given stride/up-dilation."""
    c = x.shape[-1]
    taps = len(h)
    w = jnp.broadcast_to(jnp.asarray(h)[::-1][:, None, None], (taps, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[pad],
        lhs_dilation=(lhs_dilation,), feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))


def lowpass_filter1d(x: Array, cutoff: float = 0.5, half_width: float = 0.6,
                     stride: int = 1, kernel_size: int = 12) -> Array:
    """LowPassFilter1d (reference: filter.py:61-96): depthwise
    Kaiser-sinc FIR, same-length (edge-padded) output at stride 1."""
    h = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise_fir(x, h, stride=stride)


def upsample1d(x: Array, ratio: int = 2,
               kernel_size: Optional[int] = None) -> Array:
    """Alias-free ratio-x upsampling: zero-stuff + Kaiser-sinc interp
    (reference: resample.py:9-37). (B, T, C) -> (B, ratio*T, C)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    h = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k) * ratio
    pad = k // ratio - 1
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = _depthwise_fir(x, h, lhs_dilation=ratio, pad=(k - 1, k - 1))
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    return y[:, pad_left:y.shape[1] - pad_right]


def downsample1d(x: Array, ratio: int = 2,
                 kernel_size: Optional[int] = None) -> Array:
    """Alias-free ratio-x downsampling (reference: resample.py:40-57)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    return lowpass_filter1d(x, 0.5 / ratio, 0.6 / ratio, stride=ratio,
                            kernel_size=k)


class AliasFreeActivation1d(nn.Module):
    """Alias-free nonlinearity: Kaiser-sinc upsample 2x -> activation ->
    downsample 2x (reference: src/models/facodec/alias_free_torch/
    act.py:7, filter.py:27-96, resample.py:9-57). The up/down FIR pair
    band-limits the signal so the nonlinearity's harmonics don't alias."""

    channels: int
    ratio: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """(B, T, C) -> (B, T, C)."""
        t = x.shape[1]
        up = upsample1d(x, self.ratio)
        act = SnakeBeta(self.channels, name="snake")(up)
        down = downsample1d(act, self.ratio)
        return down[:, :t]


class FACodecResUnit(nn.Module):
    """Snake residual unit (reference: facodec.py ResidualUnit)."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = AliasFreeActivation1d(self.channels, name="act_0")(x)
        h = WNConv1d(self.channels, 7, dilation=self.dilation,
                     padding=(self.dilation * 6) // 2, name="conv_0")(h)
        h = AliasFreeActivation1d(self.channels, name="act_1")(h)
        h = WNConv1d(self.channels, 1, padding=0, name="conv_1")(h)
        return x + h


class FACodecEncoderBlock(nn.Module):
    out_ch: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        for i, d in enumerate((1, 3, 9)):
            x = FACodecResUnit(in_ch, d, name=f"res_{i}")(x)
        x = AliasFreeActivation1d(in_ch, name="act")(x)
        s = self.stride
        return WNConv1d(self.out_ch, 2 * s, stride=s,
                        padding=math.ceil(s / 2), name="down")(x)


class FACodecEncoder(nn.Module):
    """(reference: facodec.py:159-215). (B, 1, T) -> (B, D, T/hop)."""

    ngf: int = 32
    up_ratios: Sequence[int] = (2, 4, 5, 5)
    out_channels: int = 256

    @property
    def hop_length(self) -> int:
        r = 1
        for s in self.up_ratios:
            r *= int(s)
        return r

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = jnp.swapaxes(x, 1, 2)
        d = self.ngf
        h = WNConv1d(d, 7, padding=3, name="stem")(h)
        for i, s in enumerate(self.up_ratios):
            d *= 2
            h = FACodecEncoderBlock(d, s, name=f"block_{i}")(h)
        h = AliasFreeActivation1d(d, name="act")(h)
        h = WNConv1d(self.out_channels, 3, padding=1, name="head")(h)
        return jnp.swapaxes(h, 1, 2)


class FACodecDecoderBlock(nn.Module):
    out_ch: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        x = AliasFreeActivation1d(in_ch, name="act")(x)
        s = self.stride
        x = WNConvTranspose1d(self.out_ch, 2 * s, stride=s,
                              padding=math.ceil(s / 2), name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = FACodecResUnit(self.out_ch, d, name=f"res_{i}")(x)
        return x


class TimbreExtractor(nn.Module):
    """Global timbre embedding by attention pooling over encoder frames
    (reference: facodec.py timbre extractor)."""

    dim: int = 256

    @nn.compact
    def __call__(self, h: Array) -> Array:
        """(B, D, T) -> (B, dim)."""
        x = jnp.swapaxes(h, 1, 2)
        x = nn.Dense(self.dim, name="proj")(x)
        w = nn.Dense(1, name="attn")(jnp.tanh(x))  # (B, T, 1)
        w = jax.nn.softmax(w, axis=1)
        return jnp.sum(x * w, axis=1)


class FactorizedVQ(nn.Module):
    """Factorized vector quantizer: project down, l2-normalize, nearest
    code, project up (reference: src/models/facodec/quantize/fvq.py:16).
    Straight-through; gradient codebook learning."""

    dim: int
    codebook_size: int = 1024
    codebook_dim: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array, Array]:
        """x: (B, T, D) -> (quantized (B,T,D), indices (B,T), loss)."""
        z = nn.Dense(self.codebook_dim, use_bias=False, name="proj_in")(x)
        z = z / jnp.clip(jnp.linalg.norm(z, axis=-1, keepdims=True),
                         min=1e-8)
        codebook = self.param("codebook", nn.initializers.normal(1.0),
                              (self.codebook_size, self.codebook_dim))
        cb = codebook / jnp.clip(
            jnp.linalg.norm(codebook, axis=-1, keepdims=True), min=1e-8)
        d = -z @ cb.T  # cosine distance
        idx = jnp.argmin(d, axis=-1)
        sel = cb[idx]
        loss = jnp.mean((jax.lax.stop_gradient(z) - sel) ** 2) \
            + 0.25 * jnp.mean((z - jax.lax.stop_gradient(sel)) ** 2)
        sel_st = z + jax.lax.stop_gradient(sel - z)
        out = nn.Dense(self.dim, use_bias=False, name="proj_out")(sel_st)
        return out, idx, loss


class FACodecDecoder(nn.Module):
    """Quantize (content + prosody FVQ stages), condition on timbre, decode
    (reference: facodec.py:218-680, capability level)."""

    in_channels: int = 256
    ngf: int = 32
    up_ratios: Sequence[int] = (5, 5, 4, 2)
    num_quantizers: int = 3
    codebook_size: int = 1024
    timbre_dim: int = 256
    gr_alpha: float = 1.0

    @nn.compact
    def __call__(self, h: Array, *, return_info: bool = False):
        """h: encoder output (B, D, T). Returns decoded (B, 1, T*hop)
        (and info with vq indices/loss, timbre, gradient-reversed content
        features for the speaker-disentanglement head)."""
        x = jnp.swapaxes(h, 1, 2)  # (B, T, D)
        timbre = TimbreExtractor(self.timbre_dim, name="timbre")(h)

        quantized = jnp.zeros_like(x)
        residual = x
        losses = 0.0
        indices = []
        for q in range(self.num_quantizers):
            out, idx, loss = FactorizedVQ(
                x.shape[-1], self.codebook_size, name=f"fvq_{q}")(residual)
            quantized = quantized + out
            residual = residual - jax.lax.stop_gradient(out)
            losses = losses + loss
            indices.append(idx)

        # speaker disentanglement: reverse gradients into the content path
        content_rev = gradient_reversal(quantized, self.gr_alpha)

        # condition on timbre (FiLM)
        cond = nn.Dense(2 * quantized.shape[-1], name="timbre_film")(
            jax.nn.silu(timbre))
        scale, shift = jnp.split(cond[:, None, :], 2, axis=-1)
        z = quantized * (1 + scale) + shift

        d = self.ngf * (2 ** len(self.up_ratios))
        z = WNConv1d(d, 7, padding=3, name="stem")(z)
        for i, s in enumerate(self.up_ratios):
            d //= 2
            z = FACodecDecoderBlock(d, s, name=f"block_{i}")(z)
        z = AliasFreeActivation1d(d, name="act")(z)
        z = WNConv1d(1, 7, padding=3, use_bias=False, name="head")(z)
        audio = jnp.tanh(jnp.swapaxes(z, 1, 2))
        if return_info:
            return audio, {
                "vq_loss": losses,
                "indices": jnp.stack(indices, axis=-1),
                "timbre": timbre,
                "content_reversed": content_rev,
            }
        return audio
