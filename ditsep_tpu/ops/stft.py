"""STFT / iSTFT with torch.stft-compatible semantics, as MXU matmuls.

Replaces the reference's torchaudio Spectrogram/InverseSpectrogram front-end
(reference: src/models/diffsep/score_models.py:28-30, n_fft=510, hop=128,
center=True, pad_mode="constant", power=None).

TPU-first design: n_fft=510 is not a friendly FFT size, but it IS a friendly
matmul size -- the (windowed) DFT is precomputed as a pair of (n_fft, F)
bases and the transform becomes `frames @ basis`, which XLA tiles straight
onto the MXU and fuses with neighbouring elementwise work. The inverse is the
same matmul transposed plus overlap-add (scatter-add with static indices).

Semantics matched to torch.stft/istft:
  * center=True pads n_fft//2 zeros both sides (pad_mode="constant")
  * window = periodic Hann of length n_fft
  * onesided rfft -> F = n_fft//2 + 1 bins
  * istft divides by the overlap-added squared-window envelope and trims the
    center padding; output length (n_frames - 1) * hop for even n_fft with
    win_length == n_fft
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    """torch.hann_window-compatible Hann window (float64 numpy)."""
    m = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * k / m))


@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int):
    """(n_fft, F) cos/-sin bases for the onesided DFT, float64 numpy."""
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    f = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * f * n / n_fft
    return np.cos(ang), -np.sin(ang)


@functools.lru_cache(maxsize=8)
def _stft_bases(n_fft: int, window_key: str = "hann"):
    win = hann_window(n_fft)
    cos_b, msin_b = _dft_bases(n_fft)
    return (
        (win[:, None] * cos_b).astype(np.float32),
        (win[:, None] * msin_b).astype(np.float32),
        win.astype(np.float32),
    )


def frame_signal(x: Array, n_fft: int, hop_length: int) -> Array:
    """(..., T) -> (..., n_frames, n_fft) overlapping frames (static gather)."""
    t = x.shape[-1]
    n_frames = 1 + (t - n_fft) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    )
    return x[..., idx]


def stft(
    x: Array,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
) -> Array:
    """(..., T) -> (..., F, n_frames) complex64 spectrogram."""
    cos_b, msin_b, _ = _stft_bases(n_fft)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    frames = frame_signal(x, n_fft, hop_length)  # (..., frames, n_fft)
    re = frames @ jnp.asarray(cos_b, dtype=frames.dtype)
    im = frames @ jnp.asarray(msin_b, dtype=frames.dtype)
    spec = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    return jnp.swapaxes(spec, -1, -2)  # (..., F, frames)


def istft(
    spec: Array,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
    length: Optional[int] = None,
) -> Array:
    """(..., F, n_frames) complex -> (..., T) waveform (torch.istft semantics)."""
    cos_b, msin_b, win = _stft_bases(n_fft)
    n_freq = n_fft // 2 + 1
    assert spec.shape[-2] == n_freq, f"expected {n_freq} bins, got {spec.shape}"
    spec = jnp.swapaxes(spec, -1, -2)  # (..., frames, F)
    n_frames = spec.shape[-2]

    # irfft as matmul: conjugate-symmetry doubling for interior bins
    mult = np.full((n_freq,), 2.0, dtype=np.float32)
    mult[0] = 1.0
    if n_fft % 2 == 0:
        mult[-1] = 1.0
    cos_f, msin_f = _dft_bases(n_fft)  # (n_fft, F) float64
    inv_cos = (cos_f * mult[None, :] / n_fft).astype(np.float32).T  # (F, n_fft)
    inv_sin = (msin_f * mult[None, :] / n_fft).astype(np.float32).T

    frames = (
        jnp.real(spec) @ jnp.asarray(inv_cos)
        + jnp.imag(spec) @ jnp.asarray(inv_sin)
    )  # (..., frames, n_fft)
    frames = frames * jnp.asarray(win)

    t_full = (n_frames - 1) * hop_length + n_fft
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]

    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, n_fft))
    out = jnp.zeros((flat.shape[0], t_full), dtype=frames.dtype)
    out = out.at[:, idx.reshape(-1)].add(flat.reshape(flat.shape[0], -1))

    # squared-window overlap-add envelope (constant, folded at trace time)
    env = np.zeros((t_full,), dtype=np.float64)
    w2 = (win.astype(np.float64)) ** 2
    for i in range(n_frames):
        env[i * hop_length : i * hop_length + n_fft] += w2
    if center:
        pad = n_fft // 2
        out = out[:, pad : t_full - pad]
        env = env[pad : t_full - pad]
    # NOLA guard as in torch.istft (nonzero envelope in the retained region)
    env = np.where(env > 1e-11, env, 1.0).astype(np.float32)
    out = out / jnp.asarray(env)

    out = out.reshape(batch_shape + (out.shape[-1],))
    if length is not None:
        cur = out.shape[-1]
        if cur < length:
            out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, length - cur)])
        else:
            out = out[..., :length]
    return out
