"""Building-block layers for the NCSN++ backbone (Flax / NHWC).

TPU-native re-design of the reference layer library
(reference: src/models/diffsep/ncsnpp_utils/layers.py and layerspp.py).
All modules operate channel-last (NHWC), the natural TPU layout: the channel
axis lands on the 128-wide lane dimension so 1x1 convs / NIN are plain
matmuls on the MXU and GroupNorm reduces along lanes.

Submodule and parameter names intentionally mirror the reference torch
module names (Conv_0, GroupNorm_1, NIN_3, Dense_0, ...) so the torch
checkpoint importer (ditsep_tpu.models.torch_import) is a mechanical
rename + layout transpose.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.ops import fir

Array = jax.Array


def default_init(scale: float = 1.0):
    """DDPM initializer: variance scaling, fan_avg, uniform
    (reference: ncsnpp_utils/layers.py:63-102 — itself a port of the JAX
    original, so jax.nn.initializers is the ground truth here)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def get_act(name: str) -> Callable[[Array], Array]:
    """Activation registry (reference: ncsnpp_utils/layers.py:29-41)."""
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError(f"activation function {name!r} does not exist")


def conv3x3(out_ch: int, *, stride: int = 1, bias: bool = True,
            dilation: int = 1, init_scale: float = 1.0,
            name: Optional[str] = None, dtype=None) -> nn.Conv:
    """3x3 conv, DDPM-initialized (reference: layers.py ddpm_conv3x3)."""
    return nn.Conv(
        out_ch, (3, 3), strides=(stride, stride),
        padding=[(dilation, dilation), (dilation, dilation)],
        kernel_dilation=(dilation, dilation), use_bias=bias,
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros, name=name, dtype=dtype,
    )


def conv1x1(out_ch: int, *, stride: int = 1, bias: bool = True,
            init_scale: float = 1.0, name: Optional[str] = None,
            dtype=None) -> nn.Conv:
    """1x1 conv (reference: layers.py ddpm_conv1x1). On TPU this is a pure
    MXU matmul over the lane axis."""
    return nn.Conv(
        out_ch, (1, 1), strides=(stride, stride), padding="VALID",
        use_bias=bias, kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros, name=name, dtype=dtype,
    )


def time_mask_to_gn(tmask, x):
    """(B, W) frame-validity mask -> GroupNorm mask shaped like the NHWC
    input x (flax GroupNorm reshapes the mask's channel axis into groups,
    so it must be materialized, not left broadcastable): statistics are
    then computed over valid frames only. Part of the padding-robust
    ("masked") mode that removes the %64 frame-pad dilution measured in
    docs/pad_dilution_r03.md."""
    if tmask is None:
        return None
    return jnp.broadcast_to(tmask[:, None, :, None], x.shape)


def pool_time_mask(tmask):
    """Downsample a (B, W) frame mask by 2 (a pooled column is valid if
    either source column was) to follow the U-Net resolution ladder.
    Odd widths pad with an invalid column first — without it the two
    strided views have different widths and jnp broadcasting silently
    blurs (or empties) the mask instead of erroring."""
    if tmask.shape[-1] % 2:
        tmask = jnp.pad(tmask, ((0, 0), (0, 1)), constant_values=False)
    return jnp.logical_or(tmask[:, ::2], tmask[:, 1::2])


class _IdentityNorm(nn.Module):
    """Profiling stand-in for GroupNorm (see DITSEP_ABLATE_NORM below)."""

    @nn.compact
    def __call__(self, x, *, mask=None):
        return x


def group_norm(ch: int, *, name: Optional[str] = None, dtype=None):
    """GroupNorm(min(ch//4, 32) groups, eps 1e-6) as used throughout NCSN++
    (reference: layerspp.py:72-73 et al.).

    DITSEP_ABLATE_NORM=1 swaps in an identity (PROFILING ONLY: quantifies
    what the norm reduction passes cost on the hot path; never use for
    training/eval)."""
    import os
    if os.environ.get("DITSEP_ABLATE_NORM") == "1":
        return _IdentityNorm(name=name)
    return nn.GroupNorm(num_groups=min(ch // 4, 32), epsilon=1e-6, name=name,
                        dtype=dtype)


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for the (log) noise level
    (reference: layerspp.py:37-46). W is sampled once and never trained."""

    embedding_size: int = 256
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param(
            "W", nn.initializers.normal(stddev=self.scale),
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)  # frozen, like requires_grad=False
        x_proj = x[:, None] * w[None, :] * 2.0 * math.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class NIN(nn.Module):
    """1x1 'network-in-network': dense over the channel (lane) axis
    (reference: layers.py:678-690). A plain matmul in NHWC."""

    num_units: int
    init_scale: float = 0.1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        w = self.param("W", default_init(self.init_scale),
                       (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        dt = self.dtype or x.dtype
        return jnp.dot(x, w.astype(dt)) + b.astype(dt)


class Combine(nn.Module):
    """Combine a skip connection: conv1x1 then cat or sum
    (reference: layerspp.py:49-64)."""

    dim2: int
    method: str = "cat"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        h = conv1x1(self.dim2, name="Conv_0", dtype=self.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
    """Spatial self-attention with per-channel features
    (reference: layerspp.py:67-97). The two einsums are batched matmuls over
    the flattened (H*W) positions -- MXU work; at the NCSN++ attention
    resolution (16 x T/16) the sequence is short, so plain softmax attention
    is already compute-bound and needs no flash-attention treatment."""

    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, tmask: Optional[Array] = None) -> Array:
        b, hh, ww, c = x.shape
        h = group_norm(c, name="GroupNorm_0", dtype=self.dtype)(
            x, mask=time_mask_to_gn(tmask, x))
        q = NIN(c, name="NIN_0", dtype=self.dtype)(h)
        k = NIN(c, name="NIN_1", dtype=self.dtype)(h)
        v = NIN(c, name="NIN_2", dtype=self.dtype)(h)

        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5)
        if tmask is not None:
            # keys in padded frames must not receive attention mass;
            # a key position (f, t) is valid iff frame t is
            kmask = jnp.broadcast_to(tmask[:, None, :], (b, hh, ww))
            w = jnp.where(kmask.reshape(b, 1, hh * ww), w, -1e9)
        w = jax.nn.softmax(w, axis=-1)
        h = jnp.einsum("bqk,bkc->bqc", w, v).reshape(b, hh, ww, c)
        h = NIN(c, init_scale=self.init_scale, name="NIN_3",
                dtype=self.dtype)(h)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class ResampleConv2d(nn.Module):
    """StyleGAN2 conv with fused FIR up/down-sampling
    (reference: up_or_down_sampling.py:20-61). Weights stored HWIO."""

    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[float] = (1, 3, 3, 1)
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert not (self.up and self.down)
        in_ch = x.shape[-1]
        init = self.kernel_init or default_init()
        w = self.param(
            "kernel", init, (self.kernel, self.kernel, in_ch, self.out_ch)
        )
        dt = self.dtype or x.dtype
        w = w.astype(dt)
        if self.up:
            x = fir.upsample_conv_2d(x, w, k=self.resample_kernel)
        elif self.down:
            x = fir.conv_downsample_2d(x, w, k=self.resample_kernel)
        else:
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            x = x + b.astype(dt)
        return x


class Upsample(nn.Module):
    """2x upsampling: FIR (optionally fused with a 3x3 conv) or nearest
    (reference: layerspp.py:100-142)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.out_ch or x.shape[-1]
        if not self.fir:
            h = fir.naive_upsample_2d(x, factor=2)
            if self.with_conv:
                h = conv3x3(out_ch, name="Conv_0", dtype=self.dtype)(h)
        else:
            if not self.with_conv:
                h = fir.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = ResampleConv2d(
                    out_ch, kernel=3, up=True,
                    resample_kernel=tuple(self.fir_kernel), use_bias=True,
                    kernel_init=default_init(), name="Conv2d_0",
                    dtype=self.dtype,
                )(x)
        return h


class Downsample(nn.Module):
    """2x downsampling: FIR (optionally fused with a 3x3 conv) or avg-pool
    (reference: layerspp.py:145-189)."""

    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = self.out_ch or x.shape[-1]
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    kernel_init=default_init(),
                    bias_init=nn.initializers.zeros, name="Conv_0",
                    dtype=self.dtype,
                )(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = fir.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                x = ResampleConv2d(
                    out_ch, kernel=3, down=True,
                    resample_kernel=tuple(self.fir_kernel), use_bias=True,
                    kernel_init=default_init(), name="Conv2d_0",
                    dtype=self.dtype,
                )(x)
        return x


class ResnetBlockDDPMpp(nn.Module):
    """DDPM residual block (reference: layerspp.py:192-248)."""

    act: Callable[[Array], Array]
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 *, deterministic: bool = True,
                 tmask: Optional[Array] = None) -> Array:
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(group_norm(in_ch, name="GroupNorm_0", dtype=self.dtype)(
            x, mask=time_mask_to_gn(tmask, x)))
        h = conv3x3(out_ch, name="Conv_0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=default_init(),
                bias_init=nn.initializers.zeros, name="Dense_0",
                dtype=self.dtype,
            )(self.act(temb))[:, None, None, :]
        h = self.act(group_norm(out_ch, name="GroupNorm_1", dtype=self.dtype)(
            h, mask=time_mask_to_gn(tmask, h)))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=self.dtype)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2", dtype=self.dtype)(x)
            else:
                x = NIN(out_ch, name="NIN_0", dtype=self.dtype)(x)
        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN residual block with optional fused FIR up/down resampling
    (reference: layerspp.py:251-328). This is the workhorse block on the
    score-net hot path."""

    act: Callable[[Array], Array]
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = True
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 *, deterministic: bool = True,
                 tmask: Optional[Array] = None,
                 tmask_out: Optional[Array] = None) -> Array:
        """``tmask`` masks GroupNorm statistics at the input resolution,
        ``tmask_out`` at the post-up/down resolution (defaults to tmask
        when the block does not resample)."""
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(group_norm(in_ch, name="GroupNorm_0", dtype=self.dtype)(
            x, mask=time_mask_to_gn(tmask, x)))

        if self.up:
            if self.fir:
                h = fir.upsample_2d(h, self.fir_kernel, factor=2)
                x = fir.upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = fir.naive_upsample_2d(h, factor=2)
                x = fir.naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = fir.downsample_2d(h, self.fir_kernel, factor=2)
                x = fir.downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = fir.naive_downsample_2d(h, factor=2)
                x = fir.naive_downsample_2d(x, factor=2)

        h = conv3x3(out_ch, name="Conv_0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=default_init(),
                bias_init=nn.initializers.zeros, name="Dense_0",
                dtype=self.dtype,
            )(self.act(temb))[:, None, None, :]
        gmask_out = time_mask_to_gn(
            tmask_out if (self.up or self.down) else tmask, h)
        h = self.act(group_norm(out_ch, name="GroupNorm_1",
                                dtype=self.dtype)(h, mask=gmask_out))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=self.dtype)(h)

        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch, name="Conv_2", dtype=self.dtype)(x)

        if not self.skip_rescale:
            return x + h
        return (x + h) / math.sqrt(2.0)
