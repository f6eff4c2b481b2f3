"""1-D diffusion U-Net (the audio-diffusion-pytorch lineage backbone).

TPU-native re-design of the capability of the vendored adp UNet family
(reference: src/stable_audio_tools/models/adp.py:24-1562 -- UNet1d /
UNetCFG1d with v-objective training). Channel-last convs; residual blocks
with timestep FiLM, optional self-attention at the deepest scales, skip
connections, and classifier-free conditioning via cross-attention tokens.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.dit import FourierFeatures
from ditsep_tpu.models.transformer import Attention

Array = jax.Array


def _conv(out_ch, k=3, stride=1, name=None, dtype=None):
    return nn.Conv(out_ch, (k,), strides=(stride,),
                   padding=[(k // 2, k // 2)], name=name, dtype=dtype)


class ResBlock1d(nn.Module):
    out_ch: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, temb: Array) -> Array:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(in_ch // 4, 32), epsilon=1e-6,
                         name="norm_0", dtype=self.dtype)(x)
        h = _conv(self.out_ch, name="conv_0", dtype=self.dtype)(
            jax.nn.silu(h))
        scale_shift = nn.Dense(2 * self.out_ch, name="film",
                               dtype=self.dtype)(jax.nn.silu(temb))
        scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=min(self.out_ch // 4, 32), epsilon=1e-6,
                         name="norm_1", dtype=self.dtype)(h)
        h = h * (1 + scale) + shift
        h = _conv(self.out_ch, name="conv_1", dtype=self.dtype)(
            jax.nn.silu(h))
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1,), name="skip",
                        dtype=self.dtype)(x)
        return (x + h) / math.sqrt(2.0)


class AttnBlock1d(nn.Module):
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array,
                 context: Optional[Array] = None) -> Array:
        c = x.shape[-1]
        h = nn.GroupNorm(num_groups=min(c // 4, 32), epsilon=1e-6,
                         name="norm", dtype=self.dtype)(x)
        h = Attention(c, dim_heads=min(64, c), name="attn",
                      zero_init_output=True, dtype=self.dtype)(h)
        x = x + h
        if context is not None:
            h = nn.GroupNorm(num_groups=min(c // 4, 32), epsilon=1e-6,
                             name="cross_norm", dtype=self.dtype)(x)
            h = Attention(c, dim_heads=min(64, c),
                          dim_context=context.shape[-1], name="cross_attn",
                          zero_init_output=True, dtype=self.dtype)(
                h, context=context)
            x = x + h
        return x


class UNet1d(nn.Module):
    """v-objective 1-D UNet. forward(x (B, C, T), t (B,)) -> (B, C, T).

    Config mirrors the adp knobs: channels, per-level multipliers and
    downsampling factors, attention at the deepest levels, optional
    cross-attention conditioning tokens (UNetCFG1d capability).
    """

    io_channels: int = 2
    channels: int = 64
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (2, 2, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[int] = (0, 0, 1)
    use_context: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array,
                 context: Optional[Array] = None,
                 embedding_mask_proba: float = 0.0,
                 rngs_key: Optional[Array] = None) -> Array:
        assert len(self.factors) == len(self.num_blocks) \
            == len(self.attentions) == len(self.multipliers) - 1
        if context is not None and embedding_mask_proba > 0 \
                and rngs_key is not None:
            keep = jax.random.uniform(
                rngs_key, (x.shape[0], 1, 1)) >= embedding_mask_proba
            context = jnp.where(keep, context, 0.0)

        h = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        temb = FourierFeatures(256, name="time_features")(t[:, None])
        temb = nn.Dense(self.channels * 4, name="time_mlp_0",
                        dtype=self.dtype)(temb)
        temb = nn.Dense(self.channels * 4, name="time_mlp_1",
                        dtype=self.dtype)(jax.nn.silu(temb))

        h = _conv(self.channels * self.multipliers[0], name="stem",
                  dtype=self.dtype)(h)
        skips = [h]
        n_levels = len(self.factors)
        for i in range(n_levels):
            ch = self.channels * self.multipliers[i + 1]
            for b in range(self.num_blocks[i]):
                h = ResBlock1d(ch, name=f"down_{i}_{b}",
                               dtype=self.dtype)(h, temb)
                if self.attentions[i]:
                    h = AttnBlock1d(name=f"down_attn_{i}_{b}",
                                    dtype=self.dtype)(
                        h, context if self.use_context else None)
                skips.append(h)
            f = self.factors[i]
            h = nn.Conv(ch, (f * 2,), strides=(f,),
                        padding=[(f // 2 + f % 2, f // 2)],
                        name=f"down_pool_{i}", dtype=self.dtype)(h)
            skips.append(h)

        h = ResBlock1d(h.shape[-1], name="mid_0", dtype=self.dtype)(h, temb)
        h = AttnBlock1d(name="mid_attn", dtype=self.dtype)(
            h, context if self.use_context else None)
        h = ResBlock1d(h.shape[-1], name="mid_1", dtype=self.dtype)(h, temb)

        for i in reversed(range(n_levels)):
            f = self.factors[i]
            ch = self.channels * self.multipliers[i + 1]
            # consume the post-pool skip at the deep resolution
            h = ResBlock1d(ch, name=f"up_pool_{i}", dtype=self.dtype)(
                jnp.concatenate([h, skips.pop()], axis=-1), temb)
            # upsample: nearest + conv
            h = jnp.repeat(h, f, axis=1)
            h = _conv(ch, name=f"up_conv_{i}", dtype=self.dtype)(h)
            for b in range(self.num_blocks[i]):
                h = ResBlock1d(ch, name=f"up_{i}_{b}", dtype=self.dtype)(
                    jnp.concatenate([h, skips.pop()], axis=-1), temb)
                if self.attentions[i]:
                    h = AttnBlock1d(name=f"up_attn_{i}_{b}",
                                    dtype=self.dtype)(
                        h, context if self.use_context else None)
        skip = skips.pop()
        assert not skips
        h = jnp.concatenate([h, skip], axis=-1)
        h = nn.GroupNorm(num_groups=min(h.shape[-1] // 4, 32), epsilon=1e-6,
                         name="out_norm", dtype=self.dtype)(h)
        h = _conv(self.io_channels, name="out_conv", dtype=self.dtype)(
            jax.nn.silu(h))
        return jnp.swapaxes(h, 1, 2)
