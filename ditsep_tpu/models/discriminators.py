"""GAN discriminators: Encodec multi-scale complex-STFT discriminator.

TPU-native re-design of the reference discriminator stack
(reference: src/stable_audio_tools/models/discriminators.py:20-62 and
models/encodec.py:38-151). Used by the VAE-GAN trainer and the LDM decoder
finetune.

Channel-last 2-D convs over (frames, freq) feature maps; weight-norm kept
as an explicit (g, v) parameterization like ditsep_tpu.models.oobleck.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.ops import stft as stft_fn

Array = jax.Array


class WNConv2d(nn.Module):
    """Weight-normalized Conv2d (NHWC), torch weight_norm semantics
    (norm over all-but-out-channel)."""

    out_ch: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    padding: Optional[Tuple[int, int]] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        v = self.param("v", nn.initializers.he_uniform(),
                       (kh, kw, in_ch, self.out_ch))
        g = self.param(
            "g", lambda key, shape: jnp.sqrt(
                jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1, 2))),
            (self.out_ch,))
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=(0, 1, 2),
                                keepdims=True) + 1e-12)
        w = (v / norm) * g.reshape(1, 1, 1, -1)
        dt = self.dtype or x.dtype
        pad = self.padding
        if pad is None:
            pad = (((kh - 1) * self.dilation[0]) // 2,
                   ((kw - 1) * self.dilation[1]) // 2)
        y = jax.lax.conv_general_dilated(
            x, w.astype(dt), window_strides=self.strides,
            padding=[(pad[0], pad[0]), (pad[1], pad[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return y + b.astype(dt)


class DiscriminatorSTFT(nn.Module):
    """Single-scale complex-STFT conv discriminator
    (reference: encodec.py:38-119). Input (B, C, T) waveform; returns
    (logits, feature maps)."""

    filters: int = 64
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    kernel_size: Tuple[int, int] = (3, 9)
    dilations: Sequence[int] = (1, 2, 4)
    stride: Tuple[int, int] = (1, 2)
    max_filters: int = 1024
    filters_scale: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, List[Array]]:
        # complex STFT, center=False, window-normalized
        spec = stft_fn(x, n_fft=self.n_fft, hop_length=self.hop_length,
                       center=False, normalized=True)  # (B, C, F, T)
        z = jnp.concatenate([spec.real, spec.imag], axis=1)  # (B, 2C, F, T)
        z = jnp.transpose(z, (0, 3, 2, 1))  # NHWC = (B, T, F, 2C)

        act = lambda h: jax.nn.leaky_relu(h, negative_slope=0.2)
        fmap = []
        ks = self.kernel_size
        z = WNConv2d(self.filters, ks, name="conv_0", dtype=self.dtype)(z)
        z = act(z)
        fmap.append(z)
        in_chs = min(self.filters_scale * self.filters, self.max_filters)
        for i, dilation in enumerate(self.dilations):
            out_chs = min((self.filters_scale ** (i + 1)) * self.filters,
                          self.max_filters)
            z = WNConv2d(out_chs, ks, strides=self.stride,
                         dilation=(dilation, 1), name=f"conv_{i+1}",
                         dtype=self.dtype)(z)
            z = act(z)
            fmap.append(z)
            in_chs = out_chs
        out_chs = min(
            (self.filters_scale ** (len(self.dilations) + 1)) * self.filters,
            self.max_filters)
        z = WNConv2d(out_chs, (ks[0], ks[0]),
                     name=f"conv_{len(self.dilations)+1}",
                     dtype=self.dtype)(z)
        z = act(z)
        fmap.append(z)
        logits = WNConv2d(self.out_channels, (ks[0], ks[0]),
                          name="conv_post", dtype=self.dtype)(z)
        return logits, fmap


class MultiScaleSTFTDiscriminator(nn.Module):
    """(reference: encodec.py:121-151). Defaults match the
    oobleck_finetune discriminator config."""

    filters: int = 64
    in_channels: int = 1
    out_channels: int = 1
    n_ffts: Sequence[int] = (2048, 1024, 512, 256, 128)
    hop_lengths: Sequence[int] = (512, 256, 128, 64, 32)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array):
        logits, fmaps = [], []
        for i, (nf, hp) in enumerate(zip(self.n_ffts, self.hop_lengths)):
            l, f = DiscriminatorSTFT(
                filters=self.filters, in_channels=self.in_channels,
                out_channels=self.out_channels, n_fft=nf, hop_length=hp,
                name=f"disc_{i}", dtype=self.dtype)(x)
            logits.append(l)
            fmaps.append(f)
        return logits, fmaps


def hinge_losses(score_real: Array, score_fake: Array) -> Tuple[Array, Array]:
    """(reference: discriminators.py:15-18)."""
    gen_loss = -jnp.mean(score_fake)
    dis_loss = (jnp.mean(jax.nn.relu(1.0 - score_real))
                + jnp.mean(jax.nn.relu(1.0 + score_fake)))
    return dis_loss, gen_loss


class SharedDiscriminatorConvNet1d(nn.Module):
    """Weight-normed strided conv discriminator (the Oobleck/RAVE-style
    backbone, reference: discriminators.py:70-121). Input (B, C, T)."""

    capacity: int = 32
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4
    out_size: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array):
        h = jnp.swapaxes(x, 1, 2)  # NWC
        feats = []
        ch = [self.capacity * 2 ** i for i in range(self.n_layers)]
        for i, c in enumerate(ch):
            from ditsep_tpu.models.oobleck import WNConv1d
            h = WNConv1d(c, self.kernel_size, stride=self.stride,
                         padding=self.kernel_size // 2, name=f"conv_{i}",
                         dtype=self.dtype)(h)
            feats.append(jnp.swapaxes(h, 1, 2))
            h = jax.nn.silu(h)
        from ditsep_tpu.models.oobleck import WNConv1d as _WN
        h = _WN(self.out_size, 1, padding=0, name="conv_out",
                dtype=self.dtype)(h)
        feats.append(jnp.swapaxes(h, 1, 2))
        score = jnp.mean(h.reshape(h.shape[0], -1), axis=-1)
        return score, feats


class OobleckDiscriminator(nn.Module):
    """Multi-scale waveform discriminator: the same convnet applied at
    successively avg-pooled scales (reference: discriminators.py:124-146,
    207-240 OobleckDiscriminator wraps MultiScaleDiscriminator)."""

    n_scales: int = 3
    capacity: int = 32
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array):
        score = 0.0
        feats = []
        h = x
        for i in range(self.n_scales):
            s, f = SharedDiscriminatorConvNet1d(
                capacity=self.capacity, name=f"scale_{i}",
                dtype=self.dtype)(h)
            score = score + s
            feats.extend(f)
            # avg-pool by 2 along time
            t = h.shape[-1] - (h.shape[-1] % 2)
            h = h[..., :t].reshape(h.shape[0], h.shape[1], t // 2, 2
                                   ).mean(-1)
        return [score[:, None, None]], [feats]


class MultiPeriodDiscriminator(nn.Module):
    """HiFi-GAN-style period discriminator: fold time by each period and
    run a 2-D convnet (reference: discriminators.py:145-180)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    capacity: int = 32
    n_layers: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array):
        logits = []
        fmaps = []
        for p in self.periods:
            pad = (p - (x.shape[-1] % p)) % p
            h = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            h = h.reshape(h.shape[0], h.shape[1], -1, p)  # (B, C, T/p, p)
            h = jnp.transpose(h, (0, 2, 3, 1))  # NHWC
            feats = []
            for i in range(self.n_layers):
                h = WNConv2d(self.capacity * 2 ** i, (5, 1),
                             strides=(3, 1), name=f"p{p}_conv_{i}",
                             dtype=self.dtype)(h)
                h = jax.nn.leaky_relu(h, 0.2)
                feats.append(h)
            h = WNConv2d(1, (3, 1), name=f"p{p}_out", dtype=self.dtype)(h)
            logits.append(h)
            fmaps.append(feats)
        return logits, fmaps


def encodec_discriminator_loss(disc: MultiScaleSTFTDiscriminator, params,
                               reals: Array, fakes: Array,
                               normalize_losses: bool = False):
    """Hinge adversarial + feature-matching losses
    (reference: discriminators.py:38-62). Returns
    (dis_loss, adv_loss, feature_matching_distance)."""
    logits_true, feats_true = disc.apply(params, reals)
    logits_fake, feats_fake = disc.apply(params, fakes)
    n = len(logits_true)
    dis_loss = 0.0
    adv_loss = 0.0
    fm = 0.0
    for i in range(n):
        if normalize_losses:
            fm_terms = [jnp.mean(jnp.abs(a - b))
                        / (jnp.mean(jnp.abs(a)) + 1e-3)
                        for a, b in zip(feats_true[i], feats_fake[i])]
        else:
            fm_terms = [jnp.mean(jnp.abs(a - b))
                        for a, b in zip(feats_true[i], feats_fake[i])]
        fm = fm + sum(fm_terms) / len(fm_terms)
        d, a = hinge_losses(logits_true[i], logits_fake[i])
        dis_loss = dis_loss + d
        adv_loss = adv_loss + a
    return dis_loss / n, adv_loss / n, fm / n
