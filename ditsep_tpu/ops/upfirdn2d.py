"""upfirdn2d: fused upsample -> FIR filter -> downsample on 2-D feature maps.

TPU-native equivalent of the reference's CUDA kernel
(reference: src/models/diffsep/ncsnpp_utils/op/upfirdn2d_kernel.cu and the
executable CPU spec op/upfirdn2d.py:159-200).

Design: the whole op is ONE `lax.conv_general_dilated` call --
* upsampling      = lhs_dilation (XLA inserts the zeros, never materialized)
* zero padding    = conv padding (negative padding supported natively)
* FIR filtering   = depthwise conv with the (flipped) kernel
* downsampling    = window strides

XLA lowers this to a single fused depthwise convolution on the TPU; its
gradient (and double-backward) is derived automatically as another dilated
conv, so no hand-written VJP is needed -- unlike the reference, whose CUDA
kernel required a custom autograd Function with an explicit second-order
backward (op/upfirdn2d.py:62-143).

One semantic detail: the reference zero-stuffs `up-1` zeros AFTER every
input sample (size in*up), while lhs_dilation inserts zeros BETWEEN samples
(size (in-1)*up + 1). We add the missing `up-1` trailing zeros to the high
padding so results match the reference spec exactly.

Layout is NHWC (TPU-native). Use `upfirdn2d_nchw` for reference-layout
parity testing.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def setup_fir_kernel(k: Union[Sequence[float], np.ndarray],
                     gain: float = 1.0) -> np.ndarray:
    """Normalize a 1-D (separable) or 2-D FIR kernel to unit DC gain, times
    `gain` (reference: up_or_down_sampling.py:192-199)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k * gain


def upfirdn2d(
    x: Array,
    kernel: Array,
    up: Union[int, Tuple[int, int]] = 1,
    down: Union[int, Tuple[int, int]] = 1,
    pad: Tuple[int, int] = (0, 0),
) -> Array:
    """Apply upfirdn to an NHWC tensor.

    Args:
      x: (N, H, W, C) input.
      kernel: (kh, kw) FIR filter.
      up / down: integer resampling factors (same for both axes, or (y, x)).
      pad: (pad0, pad1) applied to both spatial axes (before filtering,
        after upsampling), may be negative.

    Returns:
      (N, H_out, W_out, C) with
      H_out = (H*up_y + pad0 + pad1 - kh) // down_y + 1.
    """
    up_y, up_x = (up, up) if isinstance(up, int) else up
    down_y, down_x = (down, down) if isinstance(down, int) else down
    pad0, pad1 = pad

    c = x.shape[-1]
    kernel = jnp.asarray(kernel, dtype=x.dtype)
    kh, kw = kernel.shape
    # true convolution = cross-correlation with the flipped kernel
    w = jnp.flip(kernel, (0, 1)).reshape(kh, kw, 1, 1)
    w = jnp.broadcast_to(w, (kh, kw, 1, c))

    pads_y = (pad0, pad1 + up_y - 1)
    pads_x = (pad0, pad1 + up_x - 1)
    if min(*pads_y, *pads_x) < 0:
        # XLA (CPU at least) miscompiles convs mixing negative and positive
        # padding on one axis; materialize the upsampled/cropped signal and
        # run the conv with non-negative padding only.
        x = _materialize_up_pad(x, (up_y, up_x), pads_y, pads_x)
        pads_y = pads_x = (0, 0)
        up_y = up_x = 1

    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(down_y, down_x),
        padding=(pads_y, pads_x),
        lhs_dilation=(up_y, up_x),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def _materialize_up_pad(x: Array, up, pads_y, pads_x) -> Array:
    """Explicitly zero-stuff by `up` and apply (possibly negative) pads."""
    n, h, w, c = x.shape
    up_y, up_x = up
    if up_y > 1 or up_x > 1:
        # dilated signal of size (h-1)*up+1 (trailing zeros are in the pads)
        x = x.reshape(n, h, 1, w, 1, c)
        x = jnp.pad(
            x, ((0, 0), (0, 0), (0, up_y - 1), (0, 0), (0, up_x - 1), (0, 0))
        )
        x = x.reshape(n, h * up_y, w * up_x, c)
        x = x[:, : (h - 1) * up_y + 1, : (w - 1) * up_x + 1, :]

    def apply(arr, axis, lo, hi):
        if lo > 0 or hi > 0:
            cfg = [(0, 0)] * 4
            cfg[axis] = (max(lo, 0), max(hi, 0))
            arr = jnp.pad(arr, cfg)
        if lo < 0:
            arr = jax.lax.slice_in_dim(arr, -lo, arr.shape[axis], axis=axis)
        if hi < 0:
            arr = jax.lax.slice_in_dim(arr, 0, arr.shape[axis] + hi, axis=axis)
        return arr

    x = apply(x, 1, *pads_y)
    x = apply(x, 2, *pads_x)
    return x


def upfirdn2d_nchw(x: Array, kernel: Array, up=1, down=1, pad=(0, 0)) -> Array:
    """Reference-layout wrapper (N, C, H, W), for parity tests against the
    reference CPU spec."""
    y = jnp.transpose(x, (0, 2, 3, 1))
    y = upfirdn2d(y, kernel, up=up, down=down, pad=pad)
    return jnp.transpose(y, (0, 3, 1, 2))
