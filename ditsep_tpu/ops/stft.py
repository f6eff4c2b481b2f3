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
    """(..., T) -> (..., n_frames, C*hop) overlapping frames where
    C = ceil(n_fft/hop); the last C*hop - n_fft columns are padding.

    TPU-native framing: gathers serialize on the TPU scalar unit, so
    instead the signal is reshaped into hop-sized rows and each frame is a
    concat of C consecutive row-slices -- pure reshape/slice ops that XLA
    folds into the downstream DFT matmul's operand layout."""
    t = x.shape[-1]
    h = hop_length
    if t < n_fft:
        # torch.stft errors loudly here; an empty frame tensor would
        # fail far from the root cause (empty spectrograms downstream)
        raise ValueError(
            f"signal length {t} < n_fft {n_fft}: pad the input or use "
            "center=True (whose n_fft//2 reflection pads guarantee at "
            "least one frame)")
    n_frames = 1 + (t - n_fft) // h
    c = -(-n_fft // h)  # chunks per frame
    # rows r = x[r*h:(r+1)*h]; frame k = rows k..k+c-1
    n_rows = n_frames + c - 1
    pad = n_rows * h - t
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    elif pad < 0:
        x = x[..., : n_rows * h]
    rows = x.reshape(x.shape[:-1] + (n_rows, h))
    frames = jnp.concatenate(
        [rows[..., j : j + n_frames, :] for j in range(c)], axis=-1)
    return frames  # (..., n_frames, c*h)


def overlap_add(frames: Array, hop_length: int) -> Array:
    """(..., n_frames, C*hop) -> (..., (n_frames+C-1)*hop) overlap-add.

    TPU-native OLA: scatter-add serializes on TPU, so each frame is split
    into C hop-sized chunks and chunk j of all frames is shift-padded by j
    rows, then the C shifted copies are summed -- pure pad/add/reshape."""
    h = hop_length
    n_frames = frames.shape[-2]
    c = frames.shape[-1] // h
    chunks = frames.reshape(frames.shape[:-1] + (c, h))
    out_rows = n_frames + c - 1
    total = None
    for j in range(c):
        shifted = jnp.pad(
            chunks[..., j, :],
            [(0, 0)] * (frames.ndim - 2) + [(j, c - 1 - j), (0, 0)])
        total = shifted if total is None else total + shifted
    return total.reshape(frames.shape[:-2] + (out_rows * h,))


def n_frames_prepadded(length, n_fft: int, hop_length: int):
    """Frame count the separation score model's STFT produces for a
    ``length``-sample waveform, INCLUDING its n_fft-hop pre-pad
    (reference: src/models/diffsep/score_models.py:107-116).

    This is THE canonical frame-grid formula: eval bucketing, the
    serving engine's buckets, the val loader's bucket boundaries, and
    the mask_padding frame masks must all agree with the model's real
    grid, so they all import this one definition. Works on Python ints
    and jnp arrays (floor division)."""
    return (length + (n_fft - hop_length)) // hop_length + 1


def frame_block_padded_len(length: int, n_fft: int, hop_length: int,
                           block: int = 64) -> int:
    """Largest sample count whose frame count (per
    :func:`n_frames_prepadded`) stays inside the same ``block``-frame
    block as ``length`` — the model zero-pads frames to a %``block``
    boundary (reference: score_models.py:83-91), so padding a waveform
    up to this length adds ZERO extra quiet columns through the U-Net
    (docs/pad_dilution_r03.md)."""
    frames = n_frames_prepadded(length, n_fft, hop_length)
    blocks = -(-frames // block)
    return hop_length * (block * blocks) - 1 - (n_fft - hop_length)


def stft(
    x: Array,
    n_fft: int = 510,
    hop_length: int = 128,
    center: bool = True,
    normalized: bool = False,
) -> Array:
    """(..., T) -> (..., F, n_frames) complex64 spectrogram.

    `normalized` divides by sqrt(sum(win^2)) (torch.stft 'window'
    normalization, used by the Encodec discriminator's Spectrogram)."""
    cos_b, msin_b, win = _stft_bases(n_fft)
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])
    frames = frame_signal(x, n_fft, hop_length)  # (..., frames, c*hop)
    fw = frames.shape[-1]
    if fw > n_fft:  # frame rows are padded to a hop multiple; extend bases
        cos_b = np.pad(cos_b, ((0, fw - n_fft), (0, 0)))
        msin_b = np.pad(msin_b, ((0, fw - n_fft), (0, 0)))
    re = frames @ jnp.asarray(cos_b, dtype=frames.dtype)
    im = frames @ jnp.asarray(msin_b, dtype=frames.dtype)
    spec = jax.lax.complex(re.astype(jnp.float32), im.astype(jnp.float32))
    if normalized:
        spec = spec / np.sqrt(np.sum(win.astype(np.float64) ** 2))
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

    # fold window and hop-padding into the synthesis bases so the whole
    # irfft + window is one matmul; overlap-add is shift-pad sums (no
    # scatter -- see overlap_add)
    c = -(-n_fft // hop_length)
    fw = c * hop_length
    inv_cos_w = np.pad(inv_cos * win[None, :], ((0, 0), (0, fw - n_fft)))
    inv_sin_w = np.pad(inv_sin * win[None, :], ((0, 0), (0, fw - n_fft)))
    frames = (
        jnp.real(spec) @ jnp.asarray(inv_cos_w)
        + jnp.imag(spec) @ jnp.asarray(inv_sin_w)
    )  # (..., frames, c*hop)

    t_full = (n_frames - 1) * hop_length + n_fft
    batch_shape = frames.shape[:-2]
    flat = frames.reshape((-1, n_frames, fw))
    out = overlap_add(flat, hop_length)[:, :t_full]

    # squared-window overlap-add envelope (constant, folded at trace time)
    env = np.zeros((t_full,), dtype=np.float64)
    w2 = (win.astype(np.float64)) ** 2
    for i in range(n_frames):
        env[i * hop_length : i * hop_length + n_fft] += w2

    # torch.istft semantics: slice [pad : pad + length] from the UNTRIMMED
    # overlap-add buffer (so a requested `length` can consume the tail
    # samples beyond the default (n_frames-1)*hop output), padding zeros
    # only past the end of the buffer
    start = n_fft // 2 if center else 0
    default_len = t_full - 2 * start
    want = default_len if length is None else length
    end = min(start + want, t_full)
    out = out[:, start:end]
    env_s = env[start:end]
    # NOLA guard as in torch.istft (nonzero envelope in the retained region)
    env_s = np.where(env_s > 1e-11, env_s, 1.0).astype(np.float32)
    out = out / jnp.asarray(env_s)
    if end - start < want:
        out = jnp.pad(out, ((0, 0), (0, want - (end - start))))

    out = out.reshape(batch_shape + (out.shape[-1],))
    return out
