"""Fused bias-add + leaky ReLU (+ scale).

TPU-native equivalent of the reference's fused_bias_act CUDA kernel
(reference: src/models/diffsep/ncsnpp_utils/op/fused_bias_act_kernel.cu,
op/fused_act.py:20-97). On TPU this needs no kernel at all: XLA fuses the
bias broadcast, the leaky ReLU select, and the scale into whatever producer
precedes them (usually a conv), so this named op exists for API parity and
readability. Gradients (including second order) come from autodiff.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def fused_leaky_relu(
    x: Array,
    bias: Optional[Array] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
    channel_axis: int = -1,
) -> Array:
    """out = leaky_relu(x + bias) * scale, bias broadcast over the channel
    axis (NHWC by default; reference uses NCHW axis=1)."""
    if bias is not None:
        shape = [1] * x.ndim
        shape[channel_axis] = bias.shape[0]
        x = x + bias.reshape(shape)
    return jnp.where(x >= 0, x, negative_slope * x) * scale
