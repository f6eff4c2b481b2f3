"""Codec encoder/decoder zoo beyond Oobleck: DAC, SEANet, TAAE, local-attn.

Completes the reference's encoder/decoder factory surface
(reference: src/stable_audio_tools/models/autoencoders.py:782-864), which
dispatches five types. `oobleck` lives in models/oobleck.py; this module
adds the remaining four, re-designed TPU-native rather than wrapping
external packages:

- `dac`: the descript-audio-codec conv stacks the reference wraps
  (reference: autoencoders.py:359-393 DACEncoderWrapper/DACDecoderWrapper).
  DAC's residual units / strided blocks coincide with the snake variant of
  the Oobleck blocks, so these reuse them with DAC's channel-doubling
  scheme.
- `seanet`: the encodec SEANet convnet the reference imports from the
  `encodec` package (reference: autoencoders.py:791-799, 834-839). ELU
  residual stacks + strided convs + a 2-layer LSTM, the LSTM as a
  lax.scan-backed flax RNN. Padding here is the symmetric explicit scheme
  used repo-wide (shapes match T/stride exactly); encodec's asymmetric
  reflect padding is not replicated (its pretrained weights are not
  importable here anyway -- the reference itself defers to the external
  package for them).
- `taae`: transformer audio autoencoder
  (reference: autoencoders.py:91-227 TAAEBlock/TAAEEncoder/TAAEDecoder):
  strided weight-normed convs interleaved with sliding-window RoPE
  transformer blocks (dim_heads 128, qk layernorm, optional conformer /
  layer-scale), built on models/transformer.py TransformerBlock.
- `local_attn`: local-attention transformer codec
  (reference: local_attention.py:102-278). Sequence-length/channel trades
  (reshape) around local transformers; the reference's neighborhood
  attention (natten kernel k) becomes an additive band mask of window
  (k//2, k//2) -- the TPU-native equivalent with static shapes.

All modules are NWC (B, T, C) like the rest of the repo; the composed
``GenericAudioAutoencoder`` exposes the reference's channel-first
(B, C, T) public contract, mirroring OobleckVAE.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.oobleck import (
    DecoderBlock, EncoderBlock, SnakeBeta, WNConv1d, WNConvTranspose1d,
    _elu, vae_sample,
)
from ditsep_tpu.models.transformer import TransformerBlock, rotary_freqs

Array = jax.Array


# ---------------------------------------------------------------------------
# DAC (descript-audio-codec) conv stacks
# ---------------------------------------------------------------------------

class DACEncoderWrapper(nn.Module):
    """DAC encoder: snake residual blocks with channel doubling per stride,
    plus the reference wrapper's optional 1x1 projection to ``latent_dim``
    (reference: autoencoders.py:359-380; block structure identical to the
    snake Oobleck EncoderBlock, autoencoders.py:59-82,229-248)."""

    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    latent_dim: Optional[int] = None
    in_channels: int = 1
    dtype: Any = None

    @property
    def hop_length(self) -> int:
        return math.prod(int(s) for s in self.strides)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = WNConv1d(self.d_model, 7, padding=3, name="stem",
                     dtype=self.dtype)(x)
        ch = self.d_model
        for i, s in enumerate(self.strides):
            ch *= 2
            x = EncoderBlock(ch, int(s), use_snake=True, name=f"block_{i}",
                             dtype=self.dtype)(x)
        x = SnakeBeta(ch, name="act")(x)
        # DAC's final conv emits d_latent = d_model * 2^n_strides channels
        x = WNConv1d(ch, 3, padding=1, name="final", dtype=self.dtype)(x)
        if self.latent_dim is not None:
            x = WNConv1d(self.latent_dim, 1, padding=0, name="proj_out",
                         dtype=self.dtype)(x)
        return x


class DACDecoderWrapper(nn.Module):
    """DAC decoder: channel-halving snake blocks with transposed-conv
    upsampling and a tanh output
    (reference: autoencoders.py:382-393 + the wrapped dac Decoder)."""

    latent_dim: int
    channels: int = 1536
    rates: Sequence[int] = (8, 8, 4, 2)
    out_channels: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = WNConv1d(self.channels, 7, padding=3, name="stem",
                     dtype=self.dtype)(x)
        ch = self.channels
        for i, r in enumerate(self.rates):
            ch //= 2
            x = DecoderBlock(ch, int(r), use_snake=True, name=f"block_{i}",
                             dtype=self.dtype)(x)
        x = SnakeBeta(ch, name="act")(x)
        x = WNConv1d(self.out_channels, 7, padding=3, name="final",
                     dtype=self.dtype)(x)
        return jnp.tanh(x)


# ---------------------------------------------------------------------------
# SEANet (encodec)
# ---------------------------------------------------------------------------

class SEANetResnetBlock(nn.Module):
    """ELU residual block: k=3 dilated conv -> k=1 conv, with a 1x1-conv
    shortcut unless ``true_skip`` (encodec seanet.SEANetResnetBlock)."""

    dim: int
    kernel_sizes: Sequence[int] = (3, 1)
    dilations: Sequence[int] = (1, 1)
    compress: int = 2
    true_skip: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = self.dim // self.compress
        h = x
        n = len(self.kernel_sizes)
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            out = self.dim if i == n - 1 else hidden
            h = _elu(h)
            h = WNConv1d(out, int(k), dilation=int(d),
                         padding=(int(d) * (int(k) - 1)) // 2,
                         name=f"conv_{i}", dtype=self.dtype)(h)
        if self.true_skip:
            short = x
        else:
            short = WNConv1d(self.dim, 1, padding=0, name="shortcut",
                             dtype=self.dtype)(x)
        return short + h


class SLSTM(nn.Module):
    """Stacked LSTM over the time axis with a skip connection
    (encodec modules.lstm.SLSTM). Runs as a flax RNN (= lax.scan on TPU)."""

    features: int
    num_layers: int = 2
    skip: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x
        for i in range(self.num_layers):
            y = nn.RNN(nn.OptimizedLSTMCell(self.features),
                       name=f"lstm_{i}")(y)
        return y + x if self.skip else y


class SEANetEncoder(nn.Module):
    """SEANet encoder (encodec modules.seanet.SEANetEncoder; dispatched by
    reference autoencoders.py:791-799, which reverses ``ratios`` before
    construction -- here ``ratios`` is taken as given in the JSON config,
    in decoder order, and reversed internally to match)."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    dtype: Any = None

    @property
    def hop_length(self) -> int:
        return math.prod(int(r) for r in self.ratios)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mult = 1
        k = self.kernel_size
        x = WNConv1d(mult * self.n_filters, k, padding=(k - 1) // 2,
                     name="stem", dtype=self.dtype)(x)
        for bi, ratio in enumerate(reversed(list(self.ratios))):
            r = int(ratio)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    compress=self.compress, true_skip=self.true_skip,
                    name=f"res_{bi}_{j}", dtype=self.dtype)(x)
            x = _elu(x)
            x = WNConv1d(mult * self.n_filters * 2, 2 * r, stride=r,
                         padding=math.ceil(r / 2), name=f"down_{bi}",
                         dtype=self.dtype)(x)
            mult *= 2
        if self.lstm:
            x = SLSTM(mult * self.n_filters, num_layers=self.lstm,
                      name="lstm")(x)
        x = _elu(x)
        lk = self.last_kernel_size
        return WNConv1d(self.dimension, lk, padding=(lk - 1) // 2,
                        name="final", dtype=self.dtype)(x)


class SEANetDecoder(nn.Module):
    """SEANet decoder, mirror of the encoder
    (encodec modules.seanet.SEANetDecoder; reference dispatch
    autoencoders.py:834-839). ``ratios`` in decoder order as configured."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    n_residual_layers: int = 1
    ratios: Sequence[int] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    true_skip: bool = False
    compress: int = 2
    lstm: int = 2
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mult = 2 ** len(list(self.ratios))
        k = self.kernel_size
        x = WNConv1d(mult * self.n_filters, k, padding=(k - 1) // 2,
                     name="stem", dtype=self.dtype)(x)
        if self.lstm:
            x = SLSTM(mult * self.n_filters, num_layers=self.lstm,
                      name="lstm")(x)
        for bi, ratio in enumerate(self.ratios):
            r = int(ratio)
            x = _elu(x)
            x = WNConvTranspose1d(mult * self.n_filters // 2, 2 * r,
                                  stride=r, padding=math.ceil(r / 2),
                                  name=f"up_{bi}", dtype=self.dtype)(x)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base ** j, 1),
                    compress=self.compress, true_skip=self.true_skip,
                    name=f"res_{bi}_{j}", dtype=self.dtype)(x)
            mult //= 2
        x = _elu(x)
        lk = self.last_kernel_size
        return WNConv1d(self.channels, lk, padding=(lk - 1) // 2,
                        name="final", dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# TAAE (transformer audio autoencoder)
# ---------------------------------------------------------------------------

class _TAAETransformerStack(nn.Module):
    """``depth`` sliding-window RoPE transformer blocks at a fixed dim
    (reference: autoencoders.py:99-116: dim_heads 128, qk layernorm,
    norm eps 1e-2, ff mult 4, optional conformer / layer scale)."""

    dim: int
    depth: int = 3
    sliding_window: Tuple[int, int] = (31, 32)
    conformer: bool = False
    layer_scale: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim_heads = min(128, self.dim)
        rot_dim = min(max(dim_heads // 2, 32), dim_heads)
        rope = rotary_freqs(x.shape[1], rot_dim)
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, dim_heads=dim_heads,
                zero_init_branch_outputs=not self.layer_scale,
                conformer=self.conformer, layer_scale=self.layer_scale,
                qk_norm="ln", sliding_window=tuple(self.sliding_window),
                norm_eps=1e-2, name=f"block_{i}", dtype=self.dtype)(
                    x, rotary_pos_emb=rope)
        return x


class TAAEBlock(nn.Module):
    """One TAAE level: (optional dilated residual units) + activation +
    strided conv, then a transformer stack -- encoder order; the decoder
    runs the transformer first and upsamples after
    (reference: autoencoders.py:91-152)."""

    out_ch: int
    stride: int
    kind: str = "encoder"
    transformer_depth: int = 3
    use_snake: bool = False
    sliding_window: Tuple[int, int] = (31, 32)
    conformer: bool = False
    layer_scale: bool = True
    use_dilated_conv: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from ditsep_tpu.models.oobleck import ResidualUnit

        in_ch = x.shape[-1]
        s = self.stride

        def act(h, ch, name):
            if self.use_snake:
                return SnakeBeta(ch, name=name)(h)
            return h  # "none" activation (reference line 128/139)

        def res_units(h, ch, prefix):
            for i, d in enumerate((1, 3, 9)):
                h = ResidualUnit(ch, d, use_snake=self.use_snake,
                                 name=f"{prefix}_{i}", dtype=self.dtype)(h)
            return h

        xf = _TAAETransformerStack(
            self.out_ch if self.kind == "encoder" else in_ch,
            depth=self.transformer_depth,
            sliding_window=tuple(self.sliding_window),
            conformer=self.conformer, layer_scale=self.layer_scale,
            name="transformer", dtype=self.dtype)

        if self.kind == "encoder":
            if self.use_dilated_conv:
                x = res_units(x, in_ch, "res")
            x = act(x, in_ch, "act")
            if s > 1 or in_ch != self.out_ch:
                x = WNConv1d(self.out_ch, 2 * s, stride=s,
                             padding=math.ceil(s / 2), name="down",
                             dtype=self.dtype)(x)
            return xf(x)
        x = xf(x)
        x = act(x, in_ch, "act")
        if s > 1 or in_ch != self.out_ch:
            x = WNConvTranspose1d(self.out_ch, 2 * s, stride=s,
                                  padding=math.ceil(s / 2), name="up",
                                  dtype=self.dtype)(x)
        if self.use_dilated_conv:
            x = res_units(x, self.out_ch, "res")
        return x


class TAAEEncoder(nn.Module):
    """(reference: autoencoders.py:154-189)."""

    in_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 8, 8)
    transformer_depths: Sequence[int] = (3, 3, 3, 3)
    use_snake: bool = False
    sliding_window: Tuple[int, int] = (63, 64)
    conformer: bool = False
    layer_scale: bool = True
    use_dilated_conv: bool = False
    dtype: Any = None

    @property
    def hop_length(self) -> int:
        return math.prod(int(s) for s in self.strides)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dims = [c * self.channels for c in self.c_mults]
        dims = [dims[0]] + dims
        x = WNConv1d(dims[0], 7, padding=3, name="stem",
                     dtype=self.dtype)(x)
        for i, s in enumerate(self.strides):
            x = TAAEBlock(dims[i + 1], int(s), kind="encoder",
                          transformer_depth=int(self.transformer_depths[i]),
                          use_snake=self.use_snake,
                          sliding_window=tuple(self.sliding_window),
                          conformer=self.conformer,
                          layer_scale=self.layer_scale,
                          use_dilated_conv=self.use_dilated_conv,
                          name=f"block_{i}", dtype=self.dtype)(x)
        if self.use_snake:
            x = SnakeBeta(dims[-1], name="act")(x)
        return WNConv1d(self.latent_dim, 3, padding=1, name="final",
                        dtype=self.dtype)(x)


class TAAEDecoder(nn.Module):
    """(reference: autoencoders.py:191-227)."""

    out_channels: int = 2
    channels: int = 128
    latent_dim: int = 32
    c_mults: Sequence[int] = (1, 2, 4, 8)
    strides: Sequence[int] = (2, 4, 8, 8)
    transformer_depths: Sequence[int] = (3, 3, 3, 3)
    use_snake: bool = False
    sliding_window: Tuple[int, int] = (63, 64)
    conformer: bool = False
    layer_scale: bool = True
    use_dilated_conv: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dims = [c * self.channels for c in self.c_mults]
        dims = [dims[0]] + dims
        x = WNConv1d(dims[-1], 3, padding=1, name="stem",
                     dtype=self.dtype)(x)
        n = len(list(self.strides))
        for j, i in enumerate(range(n, 0, -1)):
            x = TAAEBlock(dims[i - 1], int(self.strides[i - 1]),
                          kind="decoder",
                          transformer_depth=int(
                              self.transformer_depths[i - 1]),
                          use_snake=self.use_snake,
                          sliding_window=tuple(self.sliding_window),
                          conformer=self.conformer,
                          layer_scale=self.layer_scale,
                          use_dilated_conv=self.use_dilated_conv,
                          name=f"block_{j}", dtype=self.dtype)(x)
        if self.use_snake:
            x = SnakeBeta(dims[0], name="act")(x)
        return WNConv1d(self.out_channels, 7, padding=3, use_bias=False,
                        name="final", dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Local-attention transformer codec
# ---------------------------------------------------------------------------

class _LocalTransformer(nn.Module):
    """Depth x [local self-attention + FF] with RoPE; the reference's
    neighborhood attention of kernel k maps to a (k//2, k//2) band mask
    (reference: local_attention.py:14-100)."""

    dim: int
    depth: int
    heads: int = 8
    ff_mult: float = 2.0
    window: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim_heads = self.dim // self.heads
        rot_dim = min(max(dim_heads // 2, 32), dim_heads)
        rope = rotary_freqs(x.shape[1], rot_dim)
        w = (self.window // 2, self.window // 2)
        for i in range(self.depth):
            x = TransformerBlock(
                self.dim, dim_heads=dim_heads, sliding_window=w,
                zero_init_branch_outputs=True, ff_mult=self.ff_mult,
                name=f"block_{i}", dtype=self.dtype)(
                    x, rotary_pos_emb=rope)
        return x


class LocalTransformerEncoder1D(nn.Module):
    """Downsampling local-attention codec: each level computes with a
    local transformer, then trades sequence length for channels
    ((b, n*r, c) -> (b, n, c*r)) and projects back to the level dim
    (reference: local_attention.py:102-143, 189-232)."""

    in_channels: int
    out_channels: int
    embed_dims: Sequence[int] = (96, 192, 384, 768)
    heads: Sequence[int] = (12, 12, 12, 12)
    depths: Sequence[int] = (3, 3, 3, 3)
    ratios: Sequence[int] = (2, 2, 2, 2)
    local_attn_window_size: int = 64
    dtype: Any = None

    @property
    def hop_length(self) -> int:
        return math.prod(int(r) for r in self.ratios)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.embed_dims[0], use_bias=False, name="project_in",
                     dtype=self.dtype)(x)
        for i, (dim, h, dpt, r) in enumerate(zip(
                self.embed_dims, self.heads, self.depths, self.ratios)):
            r = int(r)
            if x.shape[-1] != dim:
                x = nn.Dense(dim, use_bias=False, name=f"level_in_{i}",
                             dtype=self.dtype)(x)
            x = _LocalTransformer(dim, int(dpt), heads=int(h),
                                  window=self.local_attn_window_size,
                                  name=f"transformer_{i}",
                                  dtype=self.dtype)(x)
            b, n, c = x.shape
            x = x.reshape(b, n // r, c * r)
            x = nn.Dense(dim, use_bias=False, name=f"project_down_{i}",
                         dtype=self.dtype)(x)
        return nn.Dense(self.out_channels, use_bias=False,
                        name="project_out", dtype=self.dtype)(x)


class LocalTransformerDecoder1D(nn.Module):
    """Upsampling mirror: project channels up, trade channels for
    sequence length, then compute (reference: local_attention.py:145-186,
    235-278)."""

    in_channels: int
    out_channels: int
    embed_dims: Sequence[int] = (768, 384, 192, 96)
    heads: Sequence[int] = (12, 12, 12, 12)
    depths: Sequence[int] = (3, 3, 3, 3)
    ratios: Sequence[int] = (2, 2, 2, 2)
    local_attn_window_size: int = 64
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Dense(self.embed_dims[0], use_bias=False, name="project_in",
                     dtype=self.dtype)(x)
        for i, (dim, h, dpt, r) in enumerate(zip(
                self.embed_dims, self.heads, self.depths, self.ratios)):
            r = int(r)
            if x.shape[-1] != dim:
                x = nn.Dense(dim, use_bias=False, name=f"level_in_{i}",
                             dtype=self.dtype)(x)
            x = nn.Dense(dim * r, use_bias=False, name=f"project_up_{i}",
                         dtype=self.dtype)(x)
            b, n, c = x.shape
            x = x.reshape(b, n * r, c // r)
            x = _LocalTransformer(dim, int(dpt), heads=int(h),
                                  window=self.local_attn_window_size,
                                  name=f"transformer_{i}",
                                  dtype=self.dtype)(x)
        return nn.Dense(self.out_channels, use_bias=False,
                        name="project_out", dtype=self.dtype)(x)


# ---------------------------------------------------------------------------
# Generic composition
# ---------------------------------------------------------------------------

class GenericAudioAutoencoder(nn.Module):
    """Encoder + bottleneck + decoder orchestrator for arbitrary
    encoder/decoder pairs (reference: autoencoders.py:395-537
    AudioAutoencoder). Public layout matches the reference and OobleckVAE:
    audio (B, C, T), latents (B, D, Tl). The bottleneck is selected by
    ``bottleneck_type``: "none" | "vae" | "tanh" | "l2_norm" | "rvq";
    module-backed quantizers (rvq) live inside this module's param tree,
    as in the reference."""

    encoder: nn.Module
    decoder: nn.Module
    latent_dim: int
    bottleneck_type: str = "none"
    bottleneck_config: Any = None
    soft_clip: bool = False

    def setup(self):
        if self.bottleneck_type == "rvq":
            from ditsep_tpu.models.bottleneck import ResidualVQ
            c = dict(self.bottleneck_config or {})
            self.quantizer = ResidualVQ(
                dim=c.get("dim", self.latent_dim),
                codebook_size=c.get("codebook_size", 1024),
                num_quantizers=c.get("num_quantizers", 4))
        elif self.bottleneck_type not in ("none", "vae", "tanh", "l2_norm"):
            raise NotImplementedError(
                f"bottleneck {self.bottleneck_type!r} is not supported by "
                "GenericAudioAutoencoder")

    def encode(self, audio: Array, key: Optional[Array] = None,
               return_info: bool = False):
        """(B, C, T) -> (B, D, Tl)."""
        h = self.encoder(jnp.swapaxes(audio, -1, -2))
        info = {"kl": jnp.zeros((), h.dtype)}
        if self.bottleneck_type == "vae":
            mean, scale = jnp.split(h, 2, axis=-1)
            if key is None:
                lat = mean
            else:
                lat, kl = vae_sample(key, mean, scale)
                info["kl"] = kl
        elif self.bottleneck_type == "tanh":
            lat = jnp.tanh(h)
        elif self.bottleneck_type == "l2_norm":
            lat = h / (jnp.linalg.norm(h, axis=-1, keepdims=True) + 1e-8)
        elif self.bottleneck_type == "rvq":
            lat, codes, loss = self.quantizer(h)
            info["codes"] = codes
            info["quantizer_loss"] = loss
        else:
            lat = h
        lat = jnp.swapaxes(lat, -1, -2)
        return (lat, info) if return_info else lat

    def decode(self, latents: Array) -> Array:
        """(B, D, Tl) -> (B, C, T)."""
        y = self.decoder(jnp.swapaxes(latents, -1, -2))
        y = jnp.swapaxes(y, -1, -2)
        return jnp.tanh(y) if self.soft_clip else y

    def __call__(self, audio: Array, key: Optional[Array] = None):
        latents, info = self.encode(audio, key=key, return_info=True)
        return self.decode(latents), {**info, "latents": latents}

    @property
    def downsampling_ratio(self) -> int:
        """Audio-samples-per-latent-frame, from the encoder's hop (the
        reference AudioAutoencoder exposes the same field,
        autoencoders.py:416)."""
        return int(self.encoder.hop_length)
