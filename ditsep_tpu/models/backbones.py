"""Alternative separation backbones: Conv-TasNet TCN, dual-path
transformer (DPTNet), and the DiffuSE residual-dilated diffusion net.

(reference: src/models/diffsep/tcn.py:18-296, dptnet.py:14-181,
cdiffuse_network.py:27-164 -- present in the reference as alternative
backbones, not wired into any shipped config; kept here for capability
parity.)

Channel-last layouts throughout ((B, T, C)); public wrappers accept the
reference's (B, C, T) convention.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.normalization import choose_norm

Array = jax.Array


def _conv1d(out_ch, k, *, dilation=1, bias=True, name=None,
            feature_group_count=1):
    pad = (k - 1) * dilation // 2
    return nn.Conv(out_ch, (k,), padding=[(pad, pad)],
                   kernel_dilation=(dilation,), use_bias=bias, name=name,
                   feature_group_count=feature_group_count)


class PReLU(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a * x)


class DepthwiseSeparableConv(nn.Module):
    """(reference: tcn.py DepthwiseSeparableConv)."""

    out_ch: int
    kernel_size: int
    dilation: int
    norm_type: str = "gLN"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = _conv1d(c, self.kernel_size, dilation=self.dilation, bias=False,
                    feature_group_count=c, name="depthwise")(x)
        h = PReLU(name="prelu")(h)
        h = choose_norm(self.norm_type, c, name="norm")(h)
        return _conv1d(self.out_ch, 1, bias=False, name="pointwise")(h)


class TemporalBlock(nn.Module):
    """(reference: tcn.py TemporalBlock)."""

    hidden: int
    kernel_size: int
    dilation: int
    norm_type: str = "gLN"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b = x.shape[-1]
        h = _conv1d(self.hidden, 1, bias=False, name="conv1x1")(x)
        h = PReLU(name="prelu")(h)
        h = choose_norm(self.norm_type, self.hidden, name="norm")(h)
        h = DepthwiseSeparableConv(b, self.kernel_size, self.dilation,
                                   self.norm_type, name="dsconv")(h)
        return x + h


class TemporalConvNet(nn.Module):
    """Conv-TasNet mask network (reference: tcn.py:18-95).
    Input (B, N, K) channel-first; returns (B, C, N, K) masks."""

    N: int = 256
    B: int = 256
    H: int = 512
    P: int = 3
    X: int = 8
    R: int = 4
    C: int = 2
    norm_type: str = "gLN"
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, mixture_w: Array) -> Array:
        x = jnp.swapaxes(mixture_w, -1, -2)  # (B, K, N)
        from ditsep_tpu.models.normalization import ChannelwiseLayerNorm
        x = ChannelwiseLayerNorm(self.N, name="layer_norm")(x)
        x = _conv1d(self.B, 1, bias=False, name="bottleneck")(x)
        for r in range(self.R):
            for i in range(self.X):
                x = TemporalBlock(self.H, self.P, 2 ** i, self.norm_type,
                                  name=f"block_{r}_{i}")(x)
        x = _conv1d(self.C * self.N, 1, bias=False, name="mask_conv")(x)
        score = jnp.swapaxes(x, -1, -2)  # (B, C*N, K)
        m, k = score.shape[0], score.shape[-1]
        score = score.reshape(m, self.C, self.N, k)
        if self.mask_nonlinear == "softmax":
            return jax.nn.softmax(score, axis=1)
        if self.mask_nonlinear == "relu":
            return jax.nn.relu(score)
        if self.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(score)
        if self.mask_nonlinear == "tanh":
            return jnp.tanh(score)
        raise ValueError("Unsupported mask non-linear function")


class ImprovedTransformerLayer(nn.Module):
    """DPT transformer layer: self-attention + RNN feed-forward
    (reference: dptnet.py:14-86). x: (B, T, D)."""

    att_heads: int = 4
    hidden_size: int = 128
    rnn_type: str = "lstm"
    bidirectional: bool = True
    norm: str = "gLN"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = x.shape[-1]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.att_heads, name="self_attn")(x, x)
        out = attn + x
        out = choose_norm(self.norm, d, name="norm_attn")(out)

        cell = (nn.GRUCell if self.rnn_type.lower() == "gru"
                else nn.OptimizedLSTMCell)(features=self.hidden_size)
        rnn = nn.RNN(cell, name="rnn_fwd")
        h_fwd = rnn(out)
        if self.bidirectional:
            cell_b = (nn.GRUCell if self.rnn_type.lower() == "gru"
                      else nn.OptimizedLSTMCell)(features=self.hidden_size)
            h_bwd = nn.RNN(cell_b, reverse=True, keep_order=True,
                           name="rnn_bwd")(out)
            h = jnp.concatenate([h_fwd, h_bwd], axis=-1)
        else:
            h = h_fwd
        h = jax.nn.relu(h)
        h = nn.Dense(d, name="ff_out")(h)
        out2 = h + out
        return choose_norm(self.norm, d, name="norm_ff")(out2)


class DPTNet(nn.Module):
    """Dual-path transformer (reference: dptnet.py:89-181).
    Input (B, D, T); chunks the time axis and alternates intra-chunk /
    inter-chunk transformer layers."""

    output_size: int
    hidden_size: int = 128
    att_heads: int = 4
    num_layers: int = 2
    chunk_size: int = 100
    rnn_type: str = "lstm"
    norm_type: str = "gLN"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, d, t = x.shape
        cs = self.chunk_size
        pad = (-t) % cs
        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        n_chunks = x.shape[-1] // cs
        # (B, D, n_chunks, cs)
        h = x.reshape(b, d, n_chunks, cs)
        for i in range(self.num_layers):
            # intra-chunk: over cs
            hi = h.transpose(0, 2, 3, 1).reshape(b * n_chunks, cs, d)
            hi = ImprovedTransformerLayer(
                self.att_heads, self.hidden_size, self.rnn_type,
                name=f"intra_{i}")(hi)
            h = hi.reshape(b, n_chunks, cs, d).transpose(0, 3, 1, 2)
            # inter-chunk: over n_chunks
            he = h.transpose(0, 3, 2, 1).reshape(b * cs, n_chunks, d)
            he = ImprovedTransformerLayer(
                self.att_heads, self.hidden_size, self.rnn_type,
                name=f"inter_{i}")(he)
            h = he.reshape(b, cs, n_chunks, d).transpose(0, 3, 2, 1)
        h = h.reshape(b, d, -1)[..., :t]
        h = jnp.swapaxes(h, -1, -2)
        h = PReLU(name="out_prelu")(h)
        h = nn.Dense(self.output_size, name="out_proj")(h)
        return jnp.swapaxes(h, -1, -2)


class DiffusionEmbedding(nn.Module):
    """DiffuSE step embedding with fractional-step lerp
    (reference: cdiffuse_network.py:38-69)."""

    max_steps: int = 50

    def setup(self):
        import numpy as np
        steps = np.arange(self.max_steps)[:, None]
        dims = np.arange(64)[None, :]
        table = steps * 10.0 ** (dims * 4.0 / 63.0)
        self.table = jnp.asarray(
            np.concatenate([np.sin(table), np.cos(table)], axis=1),
            jnp.float32)
        self.projection1 = nn.Dense(512)
        self.projection2 = nn.Dense(512)

    def __call__(self, t: Array) -> Array:
        tt = t * 50.0
        low = jnp.clip(jnp.floor(tt).astype(jnp.int32), 0,
                       self.max_steps - 1)
        high = jnp.clip(jnp.ceil(tt).astype(jnp.int32), 0,
                        self.max_steps - 1)
        frac = (tt - jnp.floor(tt))[:, None]
        x = self.table[low] + (self.table[high] - self.table[low]) * frac
        x = jax.nn.silu(self.projection1(x))
        return jax.nn.silu(self.projection2(x))


class DiffuSEResidualBlock(nn.Module):
    """(reference: cdiffuse_network.py:72-110)."""

    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x: Array, t_emb: Array, cond: Array):
        c = self.residual_channels
        step = nn.Dense(c, name="diffusion_projection")(t_emb)[:, None, :]
        cond_h = _conv1d(2 * c, 3, dilation=self.dilation,
                         name="dilated_cond_conv")(cond)
        y = x + step
        y = _conv1d(2 * c, 3, dilation=self.dilation,
                    name="dilated_conv")(y) + cond_h
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)
        residual = _conv1d(c, 1, name="output_residual")(y)
        skip = _conv1d(c, 1, name="output_projection")(y)
        return (x + residual) / math.sqrt(2.0), skip


class DiffuSE(nn.Module):
    """CDiffuSE conditional diffusion net (reference:
    cdiffuse_network.py:113-164). forward(xt (B,1,T), t (B,),
    cond (B,1,T)) -> (B,1,T)."""

    residual_channels: int = 64
    residual_layers: int = 30
    dilation_cycle_length: int = 10
    max_steps: int = 50

    @nn.compact
    def __call__(self, xt: Array, t: Array, cond: Array) -> Array:
        x = jnp.swapaxes(xt, -1, -2)  # (B, T, 1)
        c = jnp.swapaxes(cond, -1, -2)
        h = jax.nn.relu(_conv1d(self.residual_channels, 1,
                                name="input_projection")(x))
        cond_h = jax.nn.relu(_conv1d(self.residual_channels, 1,
                                     name="cond_projection")(c))
        t_emb = DiffusionEmbedding(self.max_steps, name="step_embed")(t)
        skips = None
        for i in range(self.residual_layers):
            dilation = 2 ** (i % self.dilation_cycle_length)
            h, skip = DiffuSEResidualBlock(
                self.residual_channels, dilation, name=f"res_{i}")(
                h, t_emb, cond_h)
            skips = skip if skips is None else skips + skip
        h = skips / math.sqrt(self.residual_layers)
        h = jax.nn.relu(_conv1d(self.residual_channels, 1,
                                name="skip_projection")(h))
        h = _conv1d(1, 1, name="output_projection")(h)
        return jnp.swapaxes(h, -1, -2)
