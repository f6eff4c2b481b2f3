"""DiffusionAttnUnet1D — the dance-diffusion v-objective UNet.

TPU-native re-design of the reference's DAU1d family
(reference: src/stable_audio_tools/models/diffusion.py:391-505
DiffusionAttnUnet1D; building blocks src/stable_audio_tools/models/
blocks.py:14-160 ResidualBlock/ResConvBlock/SelfAttention1d/SkipBlock/
FourierFeatures/Downsample1d/Upsample1d). This is the model the four
shipped dance_diffusion JSON configs instantiate (model.type "DAU1d").

Layout: public (B, C, T) like every model here; channel-last (NWC)
internally so convs hit the MXU without transposes. The recursive
SkipBlock nesting of the reference (built deepest-first in a Python
loop) maps onto an explicit recursive Flax submodule (`_DAULevel`), and
the FIR cubic down/upsampling is a depthwise conv / dilated conv pair —
XLA fuses both into neighboring work.

The reference halves all params after init (diffusion.py:470-472); use
``scale_params(params, 0.5)`` after ``init`` for that exact behavior.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array

# FIR kernels (reference: blocks.py:99-110 _kernels)
_KERNELS = {
    "linear": [1 / 8, 3 / 8, 3 / 8, 1 / 8],
    "cubic": [-0.01171875, -0.03515625, 0.11328125, 0.43359375,
              0.43359375, 0.11328125, -0.03515625, -0.01171875],
    "lanczos3": [0.003689131001010537, 0.015056144446134567,
                 -0.03399861603975296, -0.066637322306633,
                 0.13550527393817902, 0.44638532400131226,
                 0.44638532400131226, 0.13550527393817902,
                 -0.066637322306633, -0.03399861603975296,
                 0.015056144446134567, 0.003689131001010537],
}


def fourier_features(x: Array, weight: Array) -> Array:
    """(B, F_in) @ (F_out/2, F_in) -> (B, F_out)
    (reference: blocks.py:85-94 FourierFeatures)."""
    f = 2 * math.pi * x @ weight.T
    return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


def _fir_downsample(x: Array, kernel: str) -> Array:
    """Depthwise FIR stride-2 downsample, NWC
    (reference: blocks.py:112-132 Downsample1d, reflect padding)."""
    k = jnp.asarray(_KERNELS[kernel], x.dtype)
    pad = k.shape[0] // 2 - 1
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    w = jnp.tile(k[:, None, None], (1, 1, c))  # (K, 1, C) depthwise
    return jax.lax.conv_general_dilated(
        xp, w, window_strides=(2,), padding=[(0, 0)],
        feature_group_count=c, dimension_numbers=("NWC", "WIO", "NWC"))


def _fir_upsample(x: Array, kernel: str) -> Array:
    """Depthwise FIR 2x upsample (transposed conv semantics via input
    dilation; the FIR kernels are symmetric so no flip is needed)
    (reference: blocks.py:134-155 Upsample1d)."""
    k = jnp.asarray(_KERNELS[kernel], x.dtype) * 2
    pad = k.shape[0] // 2 - 1
    c = x.shape[-1]
    xp = jnp.pad(x, ((0, 0), ((pad + 1) // 2, (pad + 1) // 2), (0, 0)),
                 mode="reflect")
    w = jnp.tile(k[:, None, None], (1, 1, c))
    return jax.lax.conv_general_dilated(
        xp, w, window_strides=(1,), padding=[(0, 0)],
        lhs_dilation=(2,), feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))


class ResConvBlock(nn.Module):
    """conv-GN-GELU x2 with a 1x1 skip when channels change
    (reference: blocks.py:14-33 ResidualBlock/ResConvBlock). GroupNorm
    uses ONE group, matching nn.GroupNorm(1, c)."""

    c_mid: int
    c_out: int
    is_last: bool = False
    kernel_size: int = 5
    conv_bias: bool = True
    use_snake: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def act(h):
            if self.use_snake:
                # snake activation option (reference passes use_snake
                # through to blocks.py's SnakeBeta path)
                a = self.param(f"snake_a_{h.shape[-1]}",
                               nn.initializers.ones, (h.shape[-1],))
                return h + jnp.sin(a * h) ** 2 / jnp.clip(a, min=1e-9)
            # torch nn.GELU() default is the exact erf form
            return jax.nn.gelu(h, approximate=False)

        pad = self.kernel_size // 2
        h = nn.Conv(self.c_mid, (self.kernel_size,), padding=pad,
                    use_bias=self.conv_bias, name="conv1",
                    dtype=self.dtype)(x)
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm1", dtype=self.dtype)(h)
        h = act(h)
        h = nn.Conv(self.c_out, (self.kernel_size,), padding=pad,
                    use_bias=self.conv_bias, name="conv2",
                    dtype=self.dtype)(h)
        if not self.is_last:
            h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm2",
                             dtype=self.dtype)(h)
            h = act(h)
        skip = x
        if x.shape[-1] != self.c_out:
            skip = nn.Conv(self.c_out, (1,), use_bias=False, name="skip",
                           dtype=self.dtype)(x)
        return h + skip


class SelfAttention1d(nn.Module):
    """GroupNorm -> 1x1 qkv -> MHA -> 1x1 out, residual
    (reference: blocks.py:35-76)."""

    n_head: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, t, c = x.shape
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm", dtype=self.dtype)(x)
        qkv = nn.Conv(c * 3, (1,), name="qkv_proj", dtype=self.dtype)(h)
        qkv = qkv.reshape(b, t, self.n_head * 3, c // self.n_head)
        qkv = jnp.swapaxes(qkv, 1, 2)  # (B, 3H, T, D)
        q, k, v = jnp.split(qkv, 3, axis=1)
        scale = (c // self.n_head) ** -0.25
        att = jax.nn.softmax((q * scale) @ jnp.swapaxes(k * scale, -2, -1),
                             axis=-1)
        y = att @ v  # (B, H, T, D)
        y = jnp.swapaxes(y, 1, 2).reshape(b, t, c)
        return x + nn.Conv(c, (1,), name="out_proj", dtype=self.dtype)(y)


class _DAULevel(nn.Module):
    """One recursion level of the UNet: the reference's SkipBlock built
    deepest-first (reference: diffusion.py:425-468). Level ``i`` (1-based
    from the outside) downsamples, runs 3 conv(+attn) blocks at
    ``channels[i-1]``, recurses, runs 3 more, and upsamples; the
    SkipBlock concatenates its input onto its output."""

    i: int
    depth: int
    channels: Sequence[int]
    strides: Sequence[int]
    attn_layer: int
    kernel_size: int = 5
    conv_bias: bool = True
    use_snake: bool = False
    learned_resample: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        i = self.i
        c = self.channels[i - 1]
        c_prev = self.channels[i - 2]
        stride = self.strides[i - 1]  # strides list includes leading 1
        add_attn = i >= self.attn_layer

        def conv(cm, co, name, is_last=False):
            return ResConvBlock(cm, co, is_last=is_last,
                                kernel_size=self.kernel_size,
                                conv_bias=self.conv_bias,
                                use_snake=self.use_snake, name=name,
                                dtype=self.dtype)

        def attn(ch, name):
            if not add_attn:
                return lambda h: h
            return SelfAttention1d(n_head=max(ch // 32, 1), name=name,
                                   dtype=self.dtype)

        inp = x
        if self.learned_resample or stride == 1:
            # Downsample1d_2: kernel 2*factor+1, stride factor, pad factor
            # (reference: blocks.py:155-166)
            h = nn.Conv(c_prev, (2 * stride + 1,), strides=(stride,),
                        padding=[(stride, stride)], name="down",
                        dtype=self.dtype)(inp)
        else:
            h = _fir_downsample(inp, "cubic")
        h = conv(c, c, "pre0")(h)
        h = attn(c, "attn0")(h)
        h = conv(c, c, "pre1")(h)
        h = attn(c, "attn1")(h)
        h = conv(c, c, "pre2")(h)
        h = attn(c, "attn2")(h)
        if i < self.depth:
            h = _DAULevel(
                i=i + 1, depth=self.depth, channels=self.channels,
                strides=self.strides, attn_layer=self.attn_layer,
                kernel_size=self.kernel_size, conv_bias=self.conv_bias,
                use_snake=self.use_snake,
                learned_resample=self.learned_resample, name="inner",
                dtype=self.dtype)(h)
        h = conv(c, c, "post0")(h)
        h = attn(c, "attn3")(h)
        h = conv(c, c, "post1")(h)
        h = attn(c, "attn4")(h)
        h = conv(c, c_prev, "post2")(h)
        h = attn(c_prev, "attn5")(h)
        if self.learned_resample:
            if stride == 1:  # Upsample1d_2 factor 1: k3 same-length conv
                h = nn.Conv(c_prev, (3,), padding=1, name="up",
                            dtype=self.dtype)(h)
            else:
                h = nn.ConvTranspose(c_prev, (2 * stride,),
                                     strides=(stride,), padding="SAME",
                                     name="up", dtype=self.dtype)(h)
        elif stride != 1:
            h = _fir_upsample(h, "cubic")
        # (stride==1 without learned_resample keeps length — the
        # reference's Upsample1d("cubic") there would 2x and break the
        # SkipBlock concat, an unreachable path off every shipped config)
        # SkipBlock: concat output with the level input
        return jnp.concatenate([h, x], axis=-1)


class DiffusionAttnUnet1D(nn.Module):
    """(reference: diffusion.py:391-505). Public layout (B, C, T);
    ``cond`` (B, D, Tc) is linearly resampled to T and concatenated, with
    optional noise augmentation at ``cond_aug_scale``."""

    io_channels: int = 2
    depth: int = 14
    n_attn_layers: int = 6
    channels: Sequence[int] = (128, 128, 256, 256) + (512,) * 10
    cond_dim: int = 0
    cond_noise_aug: bool = False
    kernel_size: int = 5
    learned_resample: bool = False
    strides: Sequence[int] = (2,) * 13
    conv_bias: bool = True
    use_snake: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array, cond: Optional[Array] = None,
                 cond_aug_scale: Optional[float] = None,
                 key: Optional[Array] = None) -> Array:
        b, _, t_len = x.shape
        h = jnp.swapaxes(x, 1, 2)  # NWC
        w = self.param("timestep_embed", nn.initializers.normal(1.0),
                       (8, 1))
        te = fourier_features(t.reshape(b, 1).astype(jnp.float32), w)
        inputs = [h, jnp.broadcast_to(te[:, None, :], (b, t_len, 16))]
        if cond is not None:
            cnd = jnp.swapaxes(cond, 1, 2)
            if cnd.shape[1] != t_len:
                cnd = jax.image.resize(
                    cnd, (b, t_len, cnd.shape[-1]), method="linear")
            if self.cond_noise_aug:
                if cond_aug_scale is None:
                    assert key is not None, (
                        "cond_noise_aug draws a random aug level: pass "
                        "key or an explicit cond_aug_scale")
                    k_lvl, k_noise = jax.random.split(key)
                    aug = jax.random.uniform(k_lvl, (b,), cnd.dtype)
                else:
                    assert key is not None
                    k_noise = key
                    aug = jnp.full((b,), cond_aug_scale, cnd.dtype)
                cnd = cnd + jax.random.normal(
                    k_noise, cnd.shape, cnd.dtype) * aug[:, None, None]
                aug_emb = fourier_features(aug.reshape(b, 1), w)
                inputs.append(jnp.broadcast_to(
                    aug_emb[:, None, :], (b, t_len, 16)))
            inputs.append(cnd)
        h = jnp.concatenate(inputs, axis=-1)

        c = self.channels[0]
        strides = (1,) + tuple(self.strides)
        attn_layer = (self.depth - self.n_attn_layers
                      if self.n_attn_layers > 0 else self.depth + 1)

        def conv(cm, co, name, is_last=False):
            return ResConvBlock(cm, co, is_last=is_last,
                                kernel_size=self.kernel_size,
                                conv_bias=self.conv_bias,
                                use_snake=self.use_snake, name=name,
                                dtype=self.dtype)

        h = conv(c, c, "stem0")(h)
        h = conv(c, c, "stem1")(h)
        h = conv(c, c, "stem2")(h)
        if self.depth > 1:
            h = _DAULevel(
                i=2, depth=self.depth, channels=tuple(self.channels),
                strides=strides, attn_layer=attn_layer,
                kernel_size=self.kernel_size, conv_bias=self.conv_bias,
                use_snake=self.use_snake,
                learned_resample=self.learned_resample, name="inner",
                dtype=self.dtype)(h)
        h = conv(c, c, "head0")(h)
        h = conv(c, c, "head1")(h)
        h = conv(c, self.io_channels, "head2", is_last=True)(h)
        return jnp.swapaxes(h, 1, 2)


def scale_params(params, factor: float = 0.5):
    """The reference halves every parameter after init
    (reference: diffusion.py:470-472)."""
    return jax.tree.map(lambda p: p * factor, params)
