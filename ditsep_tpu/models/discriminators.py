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
        # torch Conv default gain (see oobleck._torch_conv_init)
        v = self.param("v", nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
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


# --------------------------------------------------- DAC / BigVGAN zoo ---
class MPD(nn.Module):
    """DAC-flavour period discriminator: fold time by the period, run
    (5,1)-kernel stride-(3,1) WNConv2d stack
    (reference: discriminators.py:312-350)."""

    period: int
    channels: Tuple[int, ...] = (32, 128, 512, 1024, 1024)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        p = self.period
        pad = (p - (x.shape[-1] % p)) % p
        h = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        h = h.reshape(h.shape[0], h.shape[1], -1, p)
        h = jnp.transpose(h, (0, 2, 3, 1))  # (B, T/p, p, C) NHWC
        fmap = []
        for i, c in enumerate(self.channels):
            stride = (3, 1) if i < len(self.channels) - 1 else (1, 1)
            h = WNConv2d(c, (5, 1), strides=stride, padding=(2, 0),
                         name=f"conv_{i}", dtype=self.dtype)(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = WNConv2d(1, (3, 1), padding=(1, 0), name="conv_post",
                     dtype=self.dtype)(h)
        fmap.append(h)
        return fmap


class MSD(nn.Module):
    """Multi-scale waveform discriminator: grouped large-kernel 1-D
    convs over an average-pooled (rate-reduced) signal
    (reference: discriminators.py:353-386; the audiotools polyphase
    resample becomes average pooling -- equivalent anti-aliased rate
    reduction for a discriminator)."""

    rate: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        from ditsep_tpu.models.oobleck import WNConv1d

        if self.rate > 1:
            t = x.shape[-1] - (x.shape[-1] % self.rate)
            x = x[..., :t].reshape(x.shape[0], x.shape[1],
                                   t // self.rate, self.rate).mean(-1)
        h = jnp.swapaxes(x, 1, 2)  # NWC
        specs = [(16, 15, 1, 1), (64, 41, 4, 4), (256, 41, 4, 16),
                 (1024, 41, 4, 64), (1024, 41, 4, 256), (1024, 5, 1, 1)]
        fmap = []
        for i, (c, k, s, g) in enumerate(specs):
            g = min(g, h.shape[-1])
            h = WNConv1d(c, k, stride=s, padding=k // 2, groups=g,
                         name=f"conv_{i}", dtype=self.dtype)(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(jnp.swapaxes(h, 1, 2))
        h = WNConv1d(1, 3, padding=1, name="conv_post", dtype=self.dtype)(h)
        fmap.append(jnp.swapaxes(h, 1, 2))
        return fmap


MRD_BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75),
             (0.75, 1.0))


class MRD(nn.Module):
    """Complex multi-band spectrogram discriminator
    (reference: discriminators.py:392-470): STFT -> split frequency
    bands -> per-band (3,9)-kernel WNConv2d stacks -> concat -> post."""

    window_length: int
    hop_factor: float = 0.25
    bands: Tuple[Tuple[float, float], ...] = MRD_BANDS
    ch: int = 32
    dtype: Any = None

    def _spectrogram(self, x: Array) -> List[Array]:
        hop = int(self.window_length * self.hop_factor)
        spec = stft_fn(x.reshape(-1, x.shape[-1]), self.window_length,
                       hop)  # (B*C, F, T) complex
        spec = jnp.stack([spec.real, spec.imag], axis=-1)
        spec = jnp.transpose(spec, (0, 2, 1, 3))  # (B*C, T, F, 2) NHWC
        n_f = spec.shape[2]
        return [spec[:, :, int(lo * n_f):int(hi * n_f)]
                for lo, hi in self.bands]

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        fmap = []
        outs = []
        for bi, band in enumerate(self._spectrogram(x)):
            h = band
            for i in range(5):
                stride = (1, 2) if i in (1, 2, 3) else (1, 1)
                k = (3, 9) if i < 4 else (3, 3)
                h = WNConv2d(self.ch, k, strides=stride,
                             padding=(k[0] // 2, k[1] // 2),
                             name=f"band{bi}_conv_{i}",
                             dtype=self.dtype)(h)
                h = jax.nn.leaky_relu(h, 0.1)
                fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)  # along frequency
        h = WNConv2d(1, (3, 3), padding=(1, 1), name="conv_post",
                     dtype=self.dtype)(h)
        fmap.append(h)
        return fmap


class CQTDiscriminator(nn.Module):
    """Constant-Q discriminator (the BigVGAN-v2 CQT-subband idea,
    reference: discriminators.py:472-550): a fixed log-spaced complex
    filterbank (one matmul -- MXU-friendly, replacing the nnAudio CQT
    dependency) followed by a 2-D convnet over (time, bins, re/im)."""

    sample_rate: int = 8000
    n_bins: int = 48
    bins_per_octave: int = 12
    fmin: float = 32.7
    hop: int = 256
    ch: int = 32
    dtype: Any = None

    def _kernels(self):
        import numpy as np
        fs = self.sample_rate
        freqs = self.fmin * 2.0 ** (np.arange(self.n_bins)
                                    / self.bins_per_octave)
        freqs = freqs[freqs < fs / 2 * 0.95]
        q = 1.0 / (2.0 ** (1.0 / self.bins_per_octave) - 1.0)
        lens = np.ceil(q * fs / freqs).astype(int)
        n = int(2 ** np.ceil(np.log2(lens.max())))
        kern = np.zeros((len(freqs), n, 2), np.float32)
        t = np.arange(n)
        for i, (f, L) in enumerate(zip(freqs, lens)):
            L = min(L, n)
            win = np.hanning(L)
            ph = 2 * np.pi * f / fs * t[:L]
            kern[i, :L, 0] = win * np.cos(ph) / L
            kern[i, :L, 1] = -win * np.sin(ph) / L
        return jnp.asarray(kern), n

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        kern, n = self._kernels()
        xs = x.reshape(-1, x.shape[-1])
        t_frames = max(1, (xs.shape[-1] - n) // self.hop + 1)
        idx = (jnp.arange(t_frames)[:, None] * self.hop
               + jnp.arange(n)[None, :])
        frames = xs[:, idx]  # (B, T, n)
        # complex CQT response: (B, T, bins, 2)
        resp = jnp.einsum("btn,knc->btkc", frames, kern)
        h = resp
        fmap = []
        for i in range(4):
            h = WNConv2d(self.ch, (3, 9), strides=(1, 2 if i else 1),
                         padding=(1, 4), name=f"conv_{i}",
                         dtype=self.dtype)(h)
            h = jax.nn.leaky_relu(h, 0.1)
            fmap.append(h)
        h = WNConv2d(1, (3, 3), padding=(1, 1), name="conv_post",
                     dtype=self.dtype)(h)
        fmap.append(h)
        return fmap


class DACDiscriminator(nn.Module):
    """Multi-discriminator combining MPD (periods) + MSD (rates) + MRD
    (fft sizes) (reference: discriminators.py:553-596)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    rates: Tuple[int, ...] = ()
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    bands: Tuple[Tuple[float, float], ...] = MRD_BANDS
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> List[List[Array]]:
        # preprocess: remove DC, peak normalize to 0.8
        x = x - x.mean(axis=-1, keepdims=True)
        x = 0.8 * x / (jnp.abs(x).max(axis=-1, keepdims=True) + 1e-9)
        fmaps = []
        for p in self.periods:
            fmaps.append(MPD(p, name=f"mpd_{p}", dtype=self.dtype)(x))
        for r in self.rates:
            fmaps.append(MSD(r, name=f"msd_{r}", dtype=self.dtype)(x))
        for f in self.fft_sizes:
            fmaps.append(MRD(f, bands=self.bands, name=f"mrd_{f}",
                             dtype=self.dtype)(x))
        return fmaps


def dac_gan_loss(disc: DACDiscriminator, params, reals: Array,
                 fakes: Array, use_hinge: bool = False):
    """DACGANLoss.loss(): (dis_loss, gen_loss, feature_distance)
    (reference: discriminators.py:598-661). Least-squares GAN by
    default, hinge optional; L1 feature matching over all layers but the
    final logits, averaged per discriminator."""
    d_fake = disc.apply(params, fakes)
    d_real = disc.apply(params, reals)
    n = len(d_fake)
    dis_loss = 0.0
    gen_loss = 0.0
    feat = 0.0
    for fm_f, fm_r in zip(d_fake, d_real):
        lf, lr = fm_f[-1], fm_r[-1]
        if use_hinge:
            dis_loss += jnp.mean(jax.nn.relu(lf)) \
                + jnp.mean(jax.nn.relu(1.0 - lr))
            gen_loss += jnp.mean(jax.nn.relu(1.0 - lf))
        else:
            dis_loss += jnp.mean(lf ** 2) + jnp.mean((1.0 - lr) ** 2)
            gen_loss += jnp.mean((1.0 - lf) ** 2)
        layers = len(fm_f) - 1
        feat += sum(jnp.mean(jnp.abs(a - jax.lax.stop_gradient(b)))
                    for a, b in zip(fm_f[:-1], fm_r[:-1])) / layers
    return dis_loss / n, gen_loss / n, feat / n


class BigVGANDiscriminator(nn.Module):
    """MPD + CQT combination (reference: discriminators.py:663-687)."""

    sample_rate: int = 8000
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> List[List[Array]]:
        x = x - x.mean(axis=-1, keepdims=True)
        x = 0.8 * x / (jnp.abs(x).max(axis=-1, keepdims=True) + 1e-9)
        fmaps = [MPD(p, name=f"mpd_{p}", dtype=self.dtype)(x)
                 for p in self.periods]
        fmaps.append(CQTDiscriminator(sample_rate=self.sample_rate,
                                      name="cqt", dtype=self.dtype)(x))
        return fmaps


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


def create_discriminator_from_config(cfg, in_channels: int = 1,
                                     sample_rate: int = 8000):
    """loss_config['discriminator'] type dispatch
    (reference: src/stable_audio_tools/training/autoencoders.py:150-157):
    'encodec' | 'oobleck' | 'dac' | 'big_vgan'."""
    kind = cfg["type"]
    c = dict(cfg.get("config", {}))
    c.pop("channels", None)  # routed via in_channels

    def tup(d, *keys):
        for k in keys:
            if k in d and isinstance(d[k], list):
                d[k] = tuple(tuple(v) if isinstance(v, list) else v
                             for v in d[k])
        return d

    if kind == "encodec":
        tup(c, "n_ffts", "hop_lengths")
        # the shipped configs carry win_lengths == n_ffts (the window our
        # DiscriminatorSTFT always uses); reject a diverging setting
        # rather than silently ignore it
        win = c.pop("win_lengths", None)
        if win is not None and tuple(win) != tuple(c.get("n_ffts", win)):
            raise NotImplementedError(
                "encodec discriminator with win_lengths != n_ffts")
        return MultiScaleSTFTDiscriminator(in_channels=in_channels, **c)
    if kind == "oobleck":
        return OobleckDiscriminator(**c)
    if kind == "dac":
        tup(c, "periods", "rates", "fft_sizes", "bands")
        return DACDiscriminator(**c)
    if kind == "big_vgan":
        tup(c, "periods")
        c = {k: v for k, v in c.items() if not k.startswith("cqtd_")}
        return BigVGANDiscriminator(sample_rate=sample_rate, **c)
    raise ValueError(f"unknown discriminator type {kind!r}")


def discriminator_loss(disc, params, reals: Array, fakes: Array):
    """Family-generic (dis_loss, adv_loss, feature_matching) dispatch:
    fmap-list discriminators (DAC/BigVGAN) use the least-squares DACGAN
    losses, (logits, feats) discriminators (Encodec/Oobleck/MPD) the
    hinge Encodec losses."""
    if isinstance(disc, (DACDiscriminator, BigVGANDiscriminator)):
        return dac_gan_loss(disc, params, reals, fakes)
    return encodec_discriminator_loss(disc, params, reals, fakes)
