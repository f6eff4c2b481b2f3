"""OobleckVAE: fully-convolutional audio autoencoder (Flax / NWC).

TPU-native re-design of the stable-audio-tools Oobleck autoencoder
(reference: src/stable_audio_tools/models/autoencoders.py:59-356) and the
VAE bottleneck (reference: src/stable_audio_tools/models/bottleneck.py:57-86).

Design notes
------------
* Channel-last (B, T, C): 1-D convs become NWC convs whose channel axis maps
  to TPU lanes; the strided stem convs are MXU matmuls after im2col, which
  XLA performs internally.
* Weight normalization is kept as an explicit (g, v) parameterization --
  ``w = g * v / ||v||`` computed per call -- matching torch.nn.utils.
  weight_norm semantics exactly (norm over all-but-dim-0 of the torch
  layout), so VAE-GAN training behaves like the reference and torch
  checkpoints import losslessly.
* Transposed convs are expressed as input-dilated regular convs
  (lhs_dilation), the native XLA form.
* Public API uses reference layouts: (B, C, T) audio/latents.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# torch Conv/Linear default init: kaiming_uniform(a=sqrt(5)) ==
# U(+-1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform). The
# weight-normed stacks below are tuned (by the reference's torch
# training runs) to this gain; a hotter init (he_uniform is 6x the
# variance) compounds through the ~24-conv decoder into tanh
# saturation at init (exactly-zero gradients, untrainable from
# scratch — observed before this fix).
_torch_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _elu(x: Array) -> Array:
    return jax.nn.elu(x)


def snake_beta(x: Array, alpha: Array, beta: Array) -> Array:
    """SnakeBeta activation x + (1/(b+eps)) sin^2(a x) with log-scale
    parameters (reference: src/stable_audio_tools/models/blocks.py SnakeBeta).
    """
    a = jnp.exp(alpha)
    b = jnp.exp(beta)
    return x + (1.0 / (b + 1e-9)) * jnp.sin(a * x) ** 2


class SnakeBeta(nn.Module):
    """Learnable SnakeBeta activation over the channel axis."""

    channels: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = self.param("alpha", nn.initializers.zeros, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        return snake_beta(x, alpha, beta)


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d (NWC).

    Parameters: v (k, in, out) direction, g (out,) magnitude; the effective
    kernel is g * v / ||v|| with the norm taken over (k, in) per output
    channel -- identical to torch.nn.utils.weight_norm(nn.Conv1d) where the
    OIW layout norms over dims (1, 2) (reference: autoencoders.py:23-24).
    """

    out_ch: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    # int -> symmetric; (left, right) tuple -> asymmetric (torch
    # padding='same' with an even kernel pads one more on the right);
    # None -> symmetric (dilation*(k-1))//2
    padding: Optional[Any] = None
    use_bias: bool = True
    groups: int = 1  # feature_group_count (torch Conv1d groups)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        assert in_ch % self.groups == 0 and self.out_ch % self.groups == 0
        k = self.kernel_size
        v = self.param(
            "v", _torch_conv_init,
            (k, in_ch // self.groups, self.out_ch))
        # init g to ||v|| so the initial effective weight equals v
        g = self.param(
            "g", lambda key, shape: jnp.sqrt(
                jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1))),
            (self.out_ch,))
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1),
                                keepdims=True) + 1e-12)
        w = (v / norm) * g.reshape(1, 1, -1)
        dt = self.dtype or x.dtype
        pad = self.padding
        if pad is None:
            pad = (self.dilation * (k - 1)) // 2
        pad = pad if isinstance(pad, tuple) else (pad, pad)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), window_strides=(self.stride,),
            padding=[pad], rhs_dilation=(self.dilation,),
            feature_group_count=self.groups,
            dimension_numbers=("NWC", "WIO", "NWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.astype(dt)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized ConvTranspose1d (NWC) as an input-dilated conv.

    Parameters: v (k, out, in) stored in the torch ConvTranspose orientation
    transposed to channel-last, g (in,) -- torch weight_norm on a
    ConvTranspose normalizes over all-but-dim-0 of the (in, out, k) layout,
    i.e. per *input* channel (reference: autoencoders.py:26-27).
    """

    out_ch: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0  # torch ConvTranspose1d output_padding
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        k = self.kernel_size
        # flax fan_in over (k, out, in) is k*out — the same quirk as
        # torch's ConvTranspose kaiming fan_in (= size(1) * k = out*k)
        v = self.param(
            "v", _torch_conv_init, (k, self.out_ch, in_ch))
        g = self.param(
            "g", lambda key, shape: jnp.sqrt(
                jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1))),
            (in_ch,))
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1),
                                keepdims=True) + 1e-12)
        w = (v / norm) * g.reshape(1, 1, -1)  # (k, out, in)
        # transposed conv == conv with flipped kernel, lhs_dilation=stride,
        # padding (k-1-p) each side; torch's output_padding extends the
        # right edge only (out = (T-1)*s - 2p + k + output_padding)
        w = jnp.flip(w, axis=0).transpose(0, 2, 1)  # (k, in, out)
        dt = self.dtype or x.dtype
        p = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x.astype(dt), w.astype(dt), window_strides=(1,),
            padding=[(p, p + self.output_padding)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            y = y + b.astype(dt)
        return y


def _activation(use_snake: bool, channels: int, name: str):
    if use_snake:
        return SnakeBeta(channels, name=name)
    return None  # ELU, parameter-free


def _act_apply(act_mod, x):
    return act_mod(x) if act_mod is not None else _elu(x)


class ResidualUnit(nn.Module):
    """act -> dilated k=7 conv -> act -> k=1 conv, residual
    (reference: autoencoders.py:59-82)."""

    channels: int
    dilation: int
    use_snake: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        h = x
        if self.use_snake:
            h = SnakeBeta(self.channels, name="act_0")(h)
        else:
            h = _elu(h)
        h = WNConv1d(self.channels, 7, dilation=self.dilation,
                     padding=(self.dilation * 6) // 2, name="conv_0",
                     dtype=self.dtype)(h)
        if self.use_snake:
            h = SnakeBeta(self.channels, name="act_1")(h)
        else:
            h = _elu(h)
        h = WNConv1d(self.channels, 1, padding=0, name="conv_1",
                     dtype=self.dtype)(h)
        return h + res


class EncoderBlock(nn.Module):
    """3 dilated residual units + strided downsampling conv
    (reference: autoencoders.py:230-248)."""

    out_ch: int
    stride: int
    use_snake: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(in_ch, d, use_snake=self.use_snake,
                             name=f"res_{i}", dtype=self.dtype)(x)
        if self.use_snake:
            x = SnakeBeta(in_ch, name="act")(x)
        else:
            x = _elu(x)
        s = self.stride
        return WNConv1d(self.out_ch, 2 * s, stride=s,
                        padding=math.ceil(s / 2), name="down",
                        dtype=self.dtype)(x)


class DecoderBlock(nn.Module):
    """Upsampling (transposed or nearest+conv) + 3 dilated residual units
    (reference: autoencoders.py:250-283)."""

    out_ch: int
    stride: int
    use_snake: bool = False
    use_nearest_upsample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        if self.use_snake:
            x = SnakeBeta(in_ch, name="act")(x)
        else:
            x = _elu(x)
        s = self.stride
        if self.use_nearest_upsample:
            # torch padding='same' with the even 2s kernel is asymmetric
            # (s-1 left, s right); symmetric padding loses one frame per
            # block and breaks the exact T*s output-length contract
            x = jnp.repeat(x, s, axis=1)
            x = WNConv1d(self.out_ch, 2 * s, stride=1, use_bias=False,
                         padding=(s - 1, s), name="up", dtype=self.dtype)(x)
        else:
            x = WNConvTranspose1d(self.out_ch, 2 * s, stride=s,
                                  padding=math.ceil(s / 2), name="up",
                                  dtype=self.dtype)(x)
        for i, d in enumerate((1, 3, 9)):
            x = ResidualUnit(self.out_ch, d, use_snake=self.use_snake,
                             name=f"res_{i}", dtype=self.dtype)(x)
        return x


class OobleckEncoder(nn.Module):
    """(reference: autoencoders.py:285-316). Default config matches
    oobleck_finetune.json: hop 2048, latent 128 (= 2x64 for VAE mean/scale).
    """

    in_channels: int = 1
    channels: int = 128
    latent_dim: int = 128
    c_mults: Sequence[int] = (1, 2, 4, 8, 16)
    strides: Sequence[int] = (2, 4, 4, 8, 8)
    use_snake: bool = False
    dtype: Any = None

    @property
    def hop_length(self) -> int:
        return int(jnp.prod(jnp.asarray(self.strides)))

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """(B, T, C_in) -> (B, T/hop, latent_dim)."""
        c_mults = (1,) + tuple(self.c_mults)
        x = WNConv1d(c_mults[0] * self.channels, 7, padding=3, name="stem",
                     dtype=self.dtype)(x)
        for i, s in enumerate(self.strides):
            x = EncoderBlock(c_mults[i + 1] * self.channels, s,
                             use_snake=self.use_snake, name=f"block_{i}",
                             dtype=self.dtype)(x)
        if self.use_snake:
            x = SnakeBeta(c_mults[-1] * self.channels, name="act")(x)
        else:
            x = _elu(x)
        return WNConv1d(self.latent_dim, 3, padding=1, name="head",
                        dtype=self.dtype)(x)


class OobleckDecoder(nn.Module):
    """(reference: autoencoders.py:319-356)."""

    out_channels: int = 1
    channels: int = 128
    latent_dim: int = 64
    c_mults: Sequence[int] = (1, 2, 4, 8, 16)
    strides: Sequence[int] = (2, 4, 4, 8, 8)
    use_snake: bool = False
    use_nearest_upsample: bool = False
    final_tanh: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """(B, T_latent, latent_dim) -> (B, T_latent*hop, C_out)."""
        c_mults = (1,) + tuple(self.c_mults)
        x = WNConv1d(c_mults[-1] * self.channels, 7, padding=3, name="stem",
                     dtype=self.dtype)(x)
        n = len(self.strides)
        for j, i in enumerate(range(n, 0, -1)):
            x = DecoderBlock(
                c_mults[i - 1] * self.channels, self.strides[i - 1],
                use_snake=self.use_snake,
                use_nearest_upsample=self.use_nearest_upsample,
                name=f"block_{j}", dtype=self.dtype)(x)
        if self.use_snake:
            x = SnakeBeta(c_mults[0] * self.channels, name="act")(x)
        # NOTE: non-snake decoder applies NO activation before the final conv
        # (get_activation("none"), reference: autoencoders.py:221-222 uses
        # snake-or-none, unlike the encoder's snake-or-elu)
        x = WNConv1d(self.out_channels, 7, padding=3, use_bias=False,
                     name="head", dtype=self.dtype)(x)
        if self.final_tanh:
            x = jnp.tanh(x)
        return x


def vae_sample(key: Array, mean: Array, scale: Array,
               noise: Optional[Array] = None) -> Tuple[Array, Array]:
    """Reparameterized sample + KL (reference: bottleneck.py:57-65).
    KL sums over the channel axis (last here) and averages the rest.
    ``noise`` replaces the PRNG draw with an explicit standard-normal
    array (parity oracles feed the same array to the torch reference)."""
    stdev = jax.nn.softplus(scale) + 1e-4
    var = stdev * stdev
    logvar = jnp.log(var)
    z = (jax.random.normal(key, mean.shape, mean.dtype)
         if noise is None else noise.astype(mean.dtype))
    latents = z * stdev + mean
    kl = jnp.mean(jnp.sum(mean * mean + var - logvar - 1.0, axis=-1))
    return latents, kl


class OobleckVAE(nn.Module):
    """Encoder + VAE bottleneck + decoder orchestrator
    (reference: autoencoders.py:395-537 AudioAutoencoder with VAEBottleneck).

    Public layout matches the reference: audio (B, C, T), latents (B, D, Tl).
    """

    in_channels: int = 1
    out_channels: int = 1
    channels: int = 128
    latent_dim: int = 64
    c_mults: Sequence[int] = (1, 2, 4, 8, 16)
    strides: Sequence[int] = (2, 4, 4, 8, 8)
    use_snake: bool = False
    soft_clip: bool = False
    dtype: Any = None

    @property
    def downsampling_ratio(self) -> int:
        r = 1
        for s in self.strides:
            r *= int(s)
        return r

    def setup(self):
        self.encoder = OobleckEncoder(
            in_channels=self.in_channels, channels=self.channels,
            latent_dim=2 * self.latent_dim, c_mults=tuple(self.c_mults),
            strides=tuple(self.strides), use_snake=self.use_snake,
            dtype=self.dtype)
        self.decoder = OobleckDecoder(
            out_channels=self.out_channels, channels=self.channels,
            latent_dim=self.latent_dim, c_mults=tuple(self.c_mults),
            strides=tuple(self.strides), use_snake=self.use_snake,
            dtype=self.dtype)

    def encode(self, audio: Array, key: Optional[Array] = None,
               return_info: bool = False, noise: Optional[Array] = None):
        """(B, C, T) -> (B, D, T/hop). Samples the posterior when a key or
        an explicit ``noise`` array ((B, D, Tl), standard normal) is given,
        otherwise returns the mode (mean)."""
        x = jnp.swapaxes(audio, -1, -2)  # NWC
        h = self.encoder(x)
        mean, scale = jnp.split(h, 2, axis=-1)
        if key is None and noise is None:
            latents, kl = mean, jnp.zeros((), x.dtype)
        else:
            z = None if noise is None else jnp.swapaxes(noise, -1, -2)
            latents, kl = vae_sample(key, mean, scale, noise=z)
        latents = jnp.swapaxes(latents, -1, -2)
        if return_info:
            return latents, {"kl": kl,
                             "mean": jnp.swapaxes(mean, -1, -2),
                             "scale": jnp.swapaxes(scale, -1, -2)}
        return latents

    def decode(self, latents: Array) -> Array:
        """(B, D, Tl) -> (B, C, Tl*hop)."""
        x = jnp.swapaxes(latents, -1, -2)
        y = self.decoder(x)
        y = jnp.swapaxes(y, -1, -2)
        if self.soft_clip:
            y = jnp.tanh(y)
        return y

    def __call__(self, audio: Array, key: Optional[Array] = None):
        """Full round trip; returns (decoded, info)."""
        latents, info = self.encode(audio, key=key, return_info=True)
        decoded = self.decode(latents)
        return decoded, {**info, "latents": latents}


def encode_audio_chunked(vae, params, audio: Array, *, key=None,
                         overlap: int = 32, chunk_size: int = 128) -> Array:
    """Chunked encode with overlap-trim stitching for long audio
    (reference: autoencoders.py:596-664). Chunks are batched and encoded in
    ONE call (vmap-free reshape), not a Python loop per chunk -- on TPU the
    chunk axis simply joins the batch."""
    spl = vae.downsampling_ratio
    b, c, total = audio.shape
    cs = chunk_size * spl
    ov = overlap * spl
    hop = cs - ov
    if total <= cs:
        return vae.apply(params, audio, key=key, method=vae.encode)
    starts = list(range(0, total - cs + 1, hop))
    if starts[-1] + cs != total:
        starts.append(total - cs)
    chunks = jnp.stack([audio[:, :, s:s + cs] for s in starts], axis=1)
    flat = chunks.reshape(b * len(starts), c, cs)
    lat = vae.apply(params, flat, key=key, method=vae.encode)
    lat = lat.reshape(b, len(starts), vae.latent_dim, chunk_size)

    y_size = total // spl
    out = jnp.zeros((b, vae.latent_dim, y_size), lat.dtype)
    ol = overlap // 2
    n = len(starts)
    for i in range(n):
        t_start = (y_size - chunk_size) if i == n - 1 else starts[i] // spl
        t_end = t_start + chunk_size
        c_start, c_end = 0, chunk_size
        if i > 0:
            t_start += ol
            c_start += ol
        if i < n - 1:
            t_end -= ol
            c_end -= ol
        out = out.at[:, :, t_start:t_end].set(lat[:, i, :, c_start:c_end])
    return out


def decode_audio_chunked(vae, params, latents: Array, *, overlap: int = 32,
                         chunk_size: int = 128) -> Array:
    """Chunked decode, mirror of encode_audio_chunked
    (reference: autoencoders.py:666-731)."""
    spl = vae.downsampling_ratio
    b, d, total = latents.shape
    hop = chunk_size - overlap
    if total <= chunk_size:
        return vae.apply(params, latents, method=vae.decode)
    starts = list(range(0, total - chunk_size + 1, hop))
    if starts[-1] + chunk_size != total:
        starts.append(total - chunk_size)
    chunks = jnp.stack(
        [latents[:, :, s:s + chunk_size] for s in starts], axis=1)
    flat = chunks.reshape(b * len(starts), d, chunk_size)
    dec = vae.apply(params, flat, method=vae.decode)
    dec = dec.reshape(b, len(starts), vae.out_channels, chunk_size * spl)

    y_size = total * spl
    out = jnp.zeros((b, vae.out_channels, y_size), dec.dtype)
    ol = (overlap // 2) * spl
    n = len(starts)
    for i in range(n):
        t_start = (y_size - chunk_size * spl) if i == n - 1 \
            else starts[i] * spl
        t_end = t_start + chunk_size * spl
        c_start, c_end = 0, chunk_size * spl
        if i > 0:
            t_start += ol
            c_start += ol
        if i < n - 1:
            t_end -= ol
            c_end -= ol
        out = out.at[:, :, t_start:t_end].set(dec[:, i, :, c_start:c_end])
    return out
