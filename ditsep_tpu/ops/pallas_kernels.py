"""Hand-written Pallas TPU kernels.

The framework's default compute path deliberately leans on XLA fusion
(ops/upfirdn2d.py, ops/fused_act.py); these Pallas kernels are the
hand-scheduled native equivalents of the reference's CUDA extensions
(reference: src/models/diffsep/ncsnpp_utils/op/*.cu), provided for the
cases where explicit control wins and as drop-in alternates:

* fused_bias_act_pallas -- bias + leaky-ReLU * scale with a custom VJP
  (forward and backward are each ONE VMEM-resident kernel; the reference's
  CUDA op stores only the sign bit for backward -- here the backward
  recomputes the sign from (x + bias), trading one add for the mask
  buffer).
* fir_down2_h_pallas -- separable 4-tap FIR + 2x decimation along the
  second-to-last axis (the sublane axis), the inner op of NCSN++'s
  downsample_2d. Grid over row-tiles; each tile loads its 3-row halo.

Both fall back to the XLA composites for shapes that don't tile cleanly.
Use `DITSEP_USE_PALLAS=1` to route ops through these kernels.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _interpret() -> bool:
    """Pallas interpreter mode on non-TPU backends (tests run on CPU)."""
    return jax.default_backend() != "tpu"


# ----------------------------------------------------- fused bias + act ---
def _fba_fwd_kernel(x_ref, b_ref, o_ref, *, negative_slope, scale):
    x = x_ref[:] + b_ref[:]
    o_ref[:] = jnp.where(x >= 0, x, negative_slope * x) * scale


def _fba_bwd_kernel(x_ref, b_ref, g_ref, dx_ref, *, negative_slope, scale):
    x = x_ref[:] + b_ref[:]
    dx_ref[:] = g_ref[:] * jnp.where(x >= 0, scale, negative_slope * scale)


def _rows_view(x: Array) -> Tuple[Array, Tuple[int, ...]]:
    shape = x.shape
    return x.reshape(-1, shape[-1]), shape


_MAX_BLOCK_ELEMS = 512 * 1024  # ~2 MB f32 per buffer, 3 buffers < VMEM


def _row_tile(n_rows: int, n_cols: int) -> Optional[int]:
    """Largest divisor of n_rows keeping a (tile, n_cols) block in VMEM;
    None if no usable tiling exists (caller falls back to XLA)."""
    budget = max(_MAX_BLOCK_ELEMS // max(n_cols, 1), 1)
    best = None
    for tr in range(1, int(n_rows ** 0.5) + 1):
        if n_rows % tr == 0:
            for cand in (n_rows // tr, tr):
                if cand <= budget and (best is None or cand > best):
                    best = cand
    return best


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_bias_act_pallas(x: Array, bias: Array,
                          negative_slope: float = 0.2,
                          scale: float = math.sqrt(2.0)) -> Array:
    """out = leaky_relu(x + bias) * scale; bias over the last (lane) axis.
    Pallas forward; custom-VJP backward kernel."""
    return _fba_forward(x, bias, negative_slope, scale)


def _fba_forward(x, bias, negative_slope, scale):
    rows, shape = _rows_view(x)
    tr = _row_tile(rows.shape[0], rows.shape[1])
    if tr is None:  # fallback to the XLA composite
        from ditsep_tpu.ops.fused_act import fused_leaky_relu
        return fused_leaky_relu(x, bias, negative_slope, scale)
    b = jnp.broadcast_to(bias[None, :], (tr, rows.shape[1]))
    spec = pl.BlockSpec((tr, rows.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((tr, rows.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fba_fwd_kernel, negative_slope=negative_slope,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct(rows.shape, rows.dtype),
        grid=(rows.shape[0] // tr,),
        in_specs=[spec, bspec],
        out_specs=spec,
        interpret=_interpret(),
    )(rows, b)
    return out.reshape(shape)


def _fba_fwd(x, bias, negative_slope, scale):
    return _fba_forward(x, bias, negative_slope, scale), (x, bias)


def _fba_bwd(negative_slope, scale, res, g):
    x, bias = res
    rows, shape = _rows_view(x)
    g_rows = g.reshape(rows.shape)
    tr = _row_tile(rows.shape[0], rows.shape[1])
    if tr is None:
        mask = (x + bias.reshape((1,) * (x.ndim - 1) + (-1,))) >= 0
        dx = g * jnp.where(mask, scale, negative_slope * scale)
        return dx, jnp.sum(dx, axis=tuple(range(x.ndim - 1)))
    b = jnp.broadcast_to(bias[None, :], (tr, rows.shape[1]))
    spec = pl.BlockSpec((tr, rows.shape[1]), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((tr, rows.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    dx = pl.pallas_call(
        functools.partial(_fba_bwd_kernel, negative_slope=negative_slope,
                          scale=scale),
        out_shape=jax.ShapeDtypeStruct(rows.shape, rows.dtype),
        grid=(rows.shape[0] // tr,),
        in_specs=[spec, bspec, spec],
        out_specs=spec,
        interpret=_interpret(),
    )(rows, b, g_rows)
    dx = dx.reshape(shape)
    # bias sees the same masked gradient, summed over broadcast axes
    dbias = jnp.sum(dx, axis=tuple(range(x.ndim - 1)))
    return dx, dbias


fused_bias_act_pallas.defvjp(_fba_fwd, _fba_bwd)


# ------------------------------------------- separable FIR downsample 2x --
def _fir_tapsum_kernel(x0, x1, x2, x3, o_ref, *, taps):
    """Weighted sum of the four tap-aligned views: one fused VPU pass."""
    o_ref[:] = (taps[0] * x0[:] + taps[1] * x1[:]
                + taps[2] * x2[:] + taps[3] * x3[:])


def fir_down2_h_pallas(x: Array, taps, tile_h: int = 128) -> Array:
    """4-tap FIR + decimate-by-2 along axis -2 (pad (1, 2); output H//2).
    x: (..., H, C) with H even; taps: 4 floats (one axis of a separable
    FIR, e.g. the row sums of setup_fir_kernel([1,3,3,1])).

    Equivalent to upfirdn2d(..., down=2, pad=(1,1)) along one axis of a
    separable kernel (true convolution: taps are applied FLIPPED, like
    upfirdn2d). Decimation is hoisted into four tap-aligned strided views
    (XLA relayouts) so the Pallas kernel is a single evenly-tiled fused
    multiply-add pass -- no halo blocks."""
    taps = tuple(float(t) for t in np.asarray(taps).reshape(-1))[::-1]
    assert len(taps) == 4
    *lead, h, c = x.shape
    assert h % 2 == 0
    h_out = h // 2
    rows = x.reshape(-1, h, c)
    b = rows.shape[0]
    # out row i reads padded rows 2i .. 2i+3; padded size h+3
    xp = jnp.pad(rows, ((0, 0), (1, 2), (0, 0)))
    views = [jax.lax.slice_in_dim(xp, a, a + 2 * h_out, stride=2, axis=1)
             for a in range(4)]

    th = min(tile_h, h_out)
    while h_out % th:
        th //= 2
    grid = (b, h_out // th)
    spec = pl.BlockSpec((1, th, c), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_fir_tapsum_kernel, taps=taps),
        out_shape=jax.ShapeDtypeStruct((b, h_out, c), x.dtype),
        grid=grid,
        in_specs=[spec] * 4,
        out_specs=spec,
        interpret=_interpret(),
    )(*views)
    return out.reshape(*lead, h_out, c)


def downsample_2d_pallas(x: Array, k=None, factor: int = 2,
                         gain: float = 1.0) -> Array:
    """Separable FIR downsample (NHWC) via two 1-D Pallas passes; matches
    ops.fir.downsample_2d for separable 4-tap kernels at factor 2, and
    falls back to the XLA composite for every other configuration."""
    k_arr = np.asarray([1.0] * factor if k is None else k, np.float64)
    if (factor != 2 or k_arr.ndim != 1 or k_arr.shape[0] != 4
            or x.shape[1] % 2 or x.shape[2] % 2):
        from ditsep_tpu.ops.fir import downsample_2d
        return downsample_2d(x, k, factor=factor, gain=gain)
    k1 = k_arr / k_arr.sum()
    taps_h = k1 * 1.0
    taps_w = k1 * gain
    # H pass
    y = fir_down2_h_pallas(jnp.swapaxes(x, 1, 2), taps_h)  # swap W<->H
    y = jnp.swapaxes(y, 1, 2)
    # W pass: move W to axis -2
    y = fir_down2_h_pallas(y, taps_w)
    return y
