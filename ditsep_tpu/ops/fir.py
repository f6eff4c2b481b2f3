"""FIR-based up/down resampling built on `upfirdn2d` (NHWC).

Functional re-design of the StyleGAN2-lineage resampling layer
(reference: src/models/diffsep/ncsnpp_utils/up_or_down_sampling.py:63-273).
All ops are single fused XLA convolutions; weights are HWIO (flax-native).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ditsep_tpu.ops.upfirdn2d import setup_fir_kernel, upfirdn2d

Array = jax.Array


def naive_upsample_2d(x: Array, factor: int = 2) -> Array:
    """Nearest-neighbour upsampling (reference: up_or_down_sampling.py:63-67)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h, 1, w, 1, c)
    x = jnp.broadcast_to(x, (n, h, factor, w, factor, c))
    return x.reshape(n, h * factor, w * factor, c)


def naive_downsample_2d(x: Array, factor: int = 2) -> Array:
    """Box-mean downsampling (reference: up_or_down_sampling.py:70-73)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // factor, factor, w // factor, factor, c)
    return x.mean(axis=(2, 4))


def upsample_2d(x: Array, k: Optional[Sequence[float]] = None,
                factor: int = 2, gain: float = 1.0) -> Array:
    """FIR upsampling by `factor` (reference: up_or_down_sampling.py:206-239)."""
    if k is None:
        k = [1.0] * factor
    kern = setup_fir_kernel(k, gain * factor ** 2)
    p = kern.shape[0] - factor
    return upfirdn2d(x, kern, up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def downsample_2d(x: Array, k: Optional[Sequence[float]] = None,
                  factor: int = 2, gain: float = 1.0) -> Array:
    """FIR downsampling by `factor` (reference: up_or_down_sampling.py:242-273)."""
    if k is None:
        k = [1.0] * factor
    kern = setup_fir_kernel(k, gain)
    p = kern.shape[0] - factor
    return upfirdn2d(x, kern, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x: Array, w: Array, k: Optional[Sequence[float]] = None,
                     factor: int = 2, gain: float = 1.0) -> Array:
    """Fused stride-`factor` transposed conv followed by FIR filtering
    (reference: up_or_down_sampling.py:76-153).

    Args:
      x: (N, H, W, Cin). w: (kh, kw, Cin, Cout) HWIO.
    Returns: (N, H*factor, W*factor, Cout).
    """
    assert w.ndim == 4
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw
    if k is None:
        k = [1.0] * factor
    kern = setup_fir_kernel(k, gain * factor ** 2)
    p = (kern.shape[0] - factor) - (kh - 1)

    # transposed conv (stride=factor, VALID) == input-dilated conv with the
    # spatially-flipped kernel and full padding (HWIO in/out roles already
    # match the direct conv)
    w_t = jnp.flip(w, (0, 1))
    x = jax.lax.conv_general_dilated(
        x, w_t,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kw - 1, kw - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(x, kern, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x: Array, w: Array, k: Optional[Sequence[float]] = None,
                       factor: int = 2, gain: float = 1.0) -> Array:
    """Fused FIR filtering followed by stride-`factor` conv
    (reference: up_or_down_sampling.py:156-189).

    Args:
      x: (N, H, W, Cin). w: (kh, kw, Cin, Cout) HWIO.
    Returns: (N, H//factor, W//factor, Cout).
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kh == kw
    if k is None:
        k = [1.0] * factor
    kern = setup_fir_kernel(k, gain)
    p = (kern.shape[0] - factor) + (kh - 1)
    x = upfirdn2d(x, kern, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x, w,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
