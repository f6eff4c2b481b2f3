"""Spectral losses: STFT / multi-resolution STFT with perceptual
A-weighting, and a PIT wrapper.

JAX re-design of the vendored auraloss subset the reference trains with
(reference: src/stable_audio_tools/training/losses/auraloss.py:76-540 and
the PITLoss wrapper losses/losses.py:111-154). Everything here is pure jnp
on top of the matmul STFT (ditsep_tpu.ops.stft), so the whole VAE-GAN /
decoder-finetune generator loss fuses into one XLA program.
"""
from __future__ import annotations

import functools
import itertools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.ops import stft as stft_fn

Array = jax.Array


@functools.lru_cache(maxsize=8)
def a_weighting_fir(fs: int, ntaps: int = 101) -> np.ndarray:
    """Least-squares FIR fit of the IEC 1672 A-weighting response
    (reference: auraloss.py:119-151)."""
    import scipy.signal

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    a1000 = 1.9997
    nums = [(2 * np.pi * f4) ** 2 * (10 ** (a1000 / 20)), 0, 0, 0, 0]
    dens = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2])
    dens = np.polymul(np.polymul(dens, [1, 2 * np.pi * f3]),
                      [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(nums, dens, fs=fs)
    w_iir, h_iir = scipy.signal.freqz(b, a, worN=512, fs=fs)
    taps = scipy.signal.firls(ntaps, w_iir, abs(h_iir), fs=fs)
    return taps.astype(np.float32)


def fir_prefilter(x: Array, taps: np.ndarray) -> Array:
    """Apply an FIR prefilter along the last axis, 'same' padding
    (reference: auraloss.py:158-171). Channels fold into batch."""
    t = jnp.asarray(taps, x.dtype)[::-1]  # conv1d cross-correlation
    k = t.shape[0]
    shp = x.shape
    flat = x.reshape(-1, shp[-1], 1)
    w = t.reshape(k, 1, 1)
    y = jax.lax.conv_general_dilated(
        flat, w, window_strides=(1,), padding=[(k // 2, k // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y.reshape(shp[:-1] + (y.shape[1],))


def _magnitude(x: Array, fft_size: int, hop_size: int,
               eps: float = 1e-8) -> Array:
    """|STFT| with sqrt-clamp stability (reference: auraloss.py:368-388).
    win_length == fft_size (all shipped configs use equal sizes)."""
    spec = stft_fn(x, n_fft=fft_size, hop_length=hop_size)
    power = spec.real ** 2 + spec.imag ** 2
    return jnp.sqrt(jnp.clip(power, min=eps))


def stft_loss(
    x: Array, y: Array, *, fft_size: int = 1024, hop_size: int = 256,
    w_sc: float = 1.0, w_log_mag: float = 1.0, w_lin_mag: float = 0.0,
    sample_rate: Optional[int] = None, perceptual_weighting: bool = False,
    scale_invariance: bool = False, eps: float = 1e-8,
) -> Array:
    """Single-resolution STFT loss: spectral convergence + log magnitude
    (+ linear magnitude) (reference: auraloss.py:226-448).

    x, y: (B, C, T) estimate and target waveforms. Returns a scalar.
    """
    if perceptual_weighting:
        assert sample_rate is not None
        taps = a_weighting_fir(sample_rate)
        x = fir_prefilter(x, taps)
        y = fir_prefilter(y, taps)
    x_mag = _magnitude(x, fft_size, hop_size, eps)
    y_mag = _magnitude(y, fft_size, hop_size, eps)
    if scale_invariance:
        alpha = (jnp.sum(x_mag * y_mag, axis=(-2, -1), keepdims=True)
                 / jnp.clip(jnp.sum(y_mag ** 2, axis=(-2, -1),
                                    keepdims=True), min=eps))
        y_mag = y_mag * alpha
    loss = 0.0
    if w_sc:
        sc = (jnp.linalg.norm((y_mag - x_mag).reshape(
            y_mag.shape[:-2] + (-1,)), axis=-1)
            / jnp.clip(jnp.linalg.norm(
                y_mag.reshape(y_mag.shape[:-2] + (-1,)), axis=-1), min=eps))
        loss = loss + w_sc * jnp.mean(sc)
    if w_log_mag:
        loss = loss + w_log_mag * jnp.mean(
            jnp.abs(jnp.log(jnp.clip(x_mag, min=eps))
                    - jnp.log(jnp.clip(y_mag, min=eps))))
    if w_lin_mag:
        loss = loss + w_lin_mag * jnp.mean(jnp.abs(x_mag - y_mag))
    return loss


def multi_resolution_stft_loss(
    x: Array, y: Array, *,
    fft_sizes: Sequence[int] = (2048, 1024, 512, 256, 128, 64, 32),
    hop_sizes: Sequence[int] = (512, 256, 128, 64, 32, 16, 8),
    sample_rate: Optional[int] = None, perceptual_weighting: bool = False,
    w_sc: float = 1.0, w_log_mag: float = 1.0, w_lin_mag: float = 0.0,
) -> Array:
    """Mean of per-resolution STFT losses (reference: auraloss.py:451-540);
    defaults are the oobleck_finetune 'mrstft' config (reference:
    configs/model_configs/autoencoders/oobleck_finetune.json spectral)."""
    assert len(fft_sizes) == len(hop_sizes)
    if perceptual_weighting and sample_rate is not None:
        taps = a_weighting_fir(sample_rate)
        x = fir_prefilter(x, taps)
        y = fir_prefilter(y, taps)
        perceptual_weighting = False  # applied once, not per resolution
    total = 0.0
    for fs_, hs in zip(fft_sizes, hop_sizes):
        total = total + stft_loss(
            x, y, fft_size=fs_, hop_size=hs, w_sc=w_sc,
            w_log_mag=w_log_mag, w_lin_mag=w_lin_mag,
            perceptual_weighting=False)
    return total / len(fft_sizes)


def pit_min(loss_fn, est: Array, ref: Array) -> Array:
    """Permutation-invariant wrapper: evaluate ``loss_fn(est[:, p], ref)``
    for every source permutation p and take the minimum
    (reference: losses/losses.py:111-154 -- note the reference takes the
    min of the *batch-aggregated* loss, reproduced here)."""
    n = est.shape[1]
    losses = [loss_fn(est[:, list(p), ...], ref)
              for p in itertools.permutations(range(n))]
    return jnp.min(jnp.stack(losses))


@functools.lru_cache(maxsize=8)
def mel_filterbank(fs: int, n_fft: int, n_mels: int,
                   fmin: float = 0.0, fmax: Optional[float] = None
                   ) -> np.ndarray:
    """Slaney-style triangular mel filterbank (n_mels, n_fft//2+1)."""
    fmax = fmax or fs / 2

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    def mel_to_hz(m):
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / fs).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), np.float32)
    for i in range(n_mels):
        lo, ce, hi = bins[i], bins[i + 1], bins[i + 2]
        if ce > lo:
            fb[i, lo:ce] = (np.arange(lo, ce) - lo) / (ce - lo)
        if hi > ce:
            fb[i, ce:hi] = (hi - np.arange(ce, hi)) / (hi - ce)
    return fb


def mel_stft_loss(x: Array, y: Array, *, sample_rate: int = 8000,
                  fft_size: int = 1024, hop_size: int = 256,
                  n_mels: int = 80, eps: float = 1e-5) -> Array:
    """Log-mel-spectrogram L1 distance (reference: losses/losses.py
    MelSpectrogramLoss / auraloss MelSTFTLoss capability)."""
    fb = jnp.asarray(mel_filterbank(sample_rate, fft_size, n_mels))
    mx = _magnitude(x, fft_size, hop_size)  # (..., F, T)
    my = _magnitude(y, fft_size, hop_size)
    mel_x = jnp.einsum("mf,...ft->...mt", fb, mx ** 2)
    mel_y = jnp.einsum("mf,...ft->...mt", fb, my ** 2)
    return jnp.mean(jnp.abs(jnp.log(mel_x + eps) - jnp.log(mel_y + eps)))


def sum_and_difference_stft_loss(x: Array, y: Array, **kwargs) -> Array:
    """Stereo sum/difference MRSTFT (reference: auraloss.py
    SumAndDifferenceSTFTLoss). x, y: (B, 2, T)."""
    assert x.shape[1] == 2, "sum/difference loss needs stereo input"
    xs = (x[:, :1] + x[:, 1:], x[:, :1] - x[:, 1:])
    ys = (y[:, :1] + y[:, 1:], y[:, :1] - y[:, 1:])
    return 0.5 * (multi_resolution_stft_loss(xs[0], ys[0], **kwargs)
                  + multi_resolution_stft_loss(xs[1], ys[1], **kwargs))


def l1_loss(x: Array, y: Array) -> Array:
    return jnp.mean(jnp.abs(x - y))


def mse_loss(x: Array, y: Array) -> Array:
    return jnp.mean((x - y) ** 2)
