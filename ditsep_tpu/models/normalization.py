"""Normalization layers: TasNet-style gLN/cLN and the conditional norms of
the legacy NCSN stack.

(reference: src/models/diffsep/tcn.py choose_norm/ChannelwiseLayerNorm/
GlobalLayerNorm and src/models/diffsep/ncsnpp_utils/normalization.py:22-243)

Channel-last layouts: (B, T, C) for 1-D, (B, H, W, C) for 2-D.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ChannelwiseLayerNorm(nn.Module):
    """cLN: normalize over the channel axis per time step
    (reference: tcn.py ChannelwiseLayerNorm)."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


class GlobalLayerNorm(nn.Module):
    """gLN: normalize over channel and time jointly
    (reference: tcn.py GlobalLayerNorm)."""

    channels: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (self.channels,))
        beta = self.param("beta", nn.initializers.zeros, (self.channels,))
        axes = tuple(range(1, x.ndim))
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.var(x, axis=axes, keepdims=True)
        return gamma * (x - mean) / jnp.sqrt(var + self.eps) + beta


def choose_norm(norm_type: str, channels: int, name: Optional[str] = None):
    """(reference: tcn.py choose_norm)."""
    if norm_type == "gLN":
        return GlobalLayerNorm(channels, name=name)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(channels, name=name)
    if norm_type == "BN":
        # stats over batch+time; implemented as an unconditional LayerNorm
        # substitute is wrong -- use GroupNorm(1) over features per sample
        return nn.LayerNorm(name=name)
    raise ValueError(f"unsupported norm type {norm_type}")


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional instance norm with mean-reinjection ('plus')
    (reference: ncsnpp_utils/normalization.py ConditionalInstanceNorm2d
    Plus). x: (B, H, W, C); y: (B,) int class labels."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        c = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.std(means, axis=-1, keepdims=True)
        means_norm = (means - m) / (v + 1e-5)
        inst = (x - means) / (jnp.std(x, axis=(1, 2), keepdims=True) + 1e-5)

        emb_dim = 3 * c if self.bias else 2 * c
        embed = nn.Embed(self.num_classes, emb_dim,
                         embedding_init=nn.initializers.normal(0.02),
                         name="embed")(y)
        if self.bias:
            gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
        else:
            gamma, alpha = jnp.split(embed, 2, axis=-1)
            beta = 0.0
        gamma = 1.0 + gamma  # init near identity
        alpha = 1.0 + alpha
        out = (gamma[:, None, None, :] * inst
               + means_norm * alpha[:, None, None, :])
        if self.bias:
            out = out + beta[:, None, None, :]
        return out


class InstanceNorm2dPlus(nn.Module):
    """Unconditional variant (reference: normalization.py InstanceNorm2d
    Plus)."""

    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.normal(0.02), (c,)) + 1.0
        gamma = self.param("gamma", nn.initializers.normal(0.02), (c,)) + 1.0
        means = jnp.mean(x, axis=(1, 2), keepdims=True)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.std(means, axis=-1, keepdims=True)
        means_norm = (means - m) / (v + 1e-5)
        inst = (x - means) / (jnp.std(x, axis=(1, 2), keepdims=True) + 1e-5)
        out = gamma * inst + means_norm * alpha
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (c,))
            out = out + beta
        return out


def get_normalization(norm: str = "InstanceNorm++", conditional: bool = False,
                      num_classes: int = 10):
    """Dispatcher (reference: normalization.py get_normalization)."""
    if norm == "InstanceNorm++":
        if conditional:
            return lambda **kw: ConditionalInstanceNorm2dPlus(
                num_classes=num_classes, **kw)
        return lambda **kw: InstanceNorm2dPlus(**kw)
    if norm == "GroupNorm":
        return lambda **kw: nn.GroupNorm(**kw)
    raise NotImplementedError(f"{norm} not implemented")
