"""FACodec: factorized neural speech codec (optional codec backend).

TPU-native re-design of the vendored NaturalSpeech3 FACodec
(reference: src/models/facodec/facodec.py:159-680, quantize/fvq.py,
gradient_reversal.py:11-35, alias_free_torch/). Present in the reference as
an alternative codec OFF the main separation path (SURVEY section 2.8);
implemented here with the reference's full factorized structure:
DAC-style alias-free snake encoder/decoder; three residual factorized-VQ
groups with distinct roles (prosody / content / acoustic-residual, the
residual group quantizing what the first two leave behind); a timbre
transformer pooled into a speaker embedding that FiLMs decoding
(voice conversion via ``decode_with_timbre``); F0/uv/phone supervision
heads and optional gradient-reversal disentanglement heads; and
codes->embedding lookup (``vq2emb``) for token-domain use.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.oobleck import SnakeBeta, WNConv1d, WNConvTranspose1d

Array = jax.Array


@jax.custom_vjp
def gradient_reversal(x: Array, alpha: float = 1.0) -> Array:
    """Identity forward, -alpha * grad backward
    (reference: src/models/facodec/gradient_reversal.py:11-35)."""
    return x


def _gr_fwd(x, alpha):
    return x, alpha


def _gr_bwd(alpha, g):
    return (-alpha * g, None)


gradient_reversal.defvjp(_gr_fwd, _gr_bwd)


def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int):
    """Windowed-sinc lowpass with the adaptive Kaiser design rule
    (reference: src/models/facodec/alias_free_torch/filter.py:27-58):
    beta follows the standard Kaiser attenuation estimate
    A = 2.285*(N-1)*pi*(4*half_width) + 7.95, and the kernel is
    normalised to unit sum. cutoff in cycles/sample (0..0.5)."""
    import numpy as np
    if not 0.0 <= cutoff <= 0.5:
        raise ValueError("cutoff must be in [0, 0.5]")
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4.0 * half_width
    a = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    if a > 50.0:
        beta = 0.1102 * (a - 8.7)
    elif a >= 21.0:
        beta = 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    h = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    return (h / h.sum()).astype(np.float32)


def _depthwise_fir(x: Array, h, stride: int = 1, lhs_dilation: int = 1,
                   pad=(0, 0)) -> Array:
    """Depthwise FIR over (B, T, C) with the given stride/up-dilation."""
    c = x.shape[-1]
    taps = len(h)
    w = jnp.broadcast_to(jnp.asarray(h)[::-1][:, None, None], (taps, 1, c))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[pad],
        lhs_dilation=(lhs_dilation,), feature_group_count=c,
        dimension_numbers=("NWC", "WIO", "NWC"))


def lowpass_filter1d(x: Array, cutoff: float = 0.5, half_width: float = 0.6,
                     stride: int = 1, kernel_size: int = 12) -> Array:
    """LowPassFilter1d (reference: filter.py:61-96): depthwise
    Kaiser-sinc FIR, same-length (edge-padded) output at stride 1."""
    h = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="edge")
    return _depthwise_fir(x, h, stride=stride)


def upsample1d(x: Array, ratio: int = 2,
               kernel_size: Optional[int] = None) -> Array:
    """Alias-free ratio-x upsampling: zero-stuff + Kaiser-sinc interp
    (reference: resample.py:9-37). (B, T, C) -> (B, ratio*T, C)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    h = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k) * ratio
    pad = k // ratio - 1
    x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    y = _depthwise_fir(x, h, lhs_dilation=ratio, pad=(k - 1, k - 1))
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    return y[:, pad_left:y.shape[1] - pad_right]


def downsample1d(x: Array, ratio: int = 2,
                 kernel_size: Optional[int] = None) -> Array:
    """Alias-free ratio-x downsampling (reference: resample.py:40-57)."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    return lowpass_filter1d(x, 0.5 / ratio, 0.6 / ratio, stride=ratio,
                            kernel_size=k)


class AliasFreeActivation1d(nn.Module):
    """Alias-free nonlinearity: Kaiser-sinc upsample 2x -> activation ->
    downsample 2x (reference: src/models/facodec/alias_free_torch/
    act.py:7, filter.py:27-96, resample.py:9-57). The up/down FIR pair
    band-limits the signal so the nonlinearity's harmonics don't alias."""

    channels: int
    ratio: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """(B, T, C) -> (B, T, C)."""
        t = x.shape[1]
        up = upsample1d(x, self.ratio)
        act = SnakeBeta(self.channels, name="snake")(up)
        down = downsample1d(act, self.ratio)
        return down[:, :t]


class FACodecResUnit(nn.Module):
    """Snake residual unit (reference: facodec.py ResidualUnit)."""

    channels: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = AliasFreeActivation1d(self.channels, name="act_0")(x)
        h = WNConv1d(self.channels, 7, dilation=self.dilation,
                     padding=(self.dilation * 6) // 2, name="conv_0")(h)
        h = AliasFreeActivation1d(self.channels, name="act_1")(h)
        h = WNConv1d(self.channels, 1, padding=0, name="conv_1")(h)
        return x + h


class FACodecEncoderBlock(nn.Module):
    out_ch: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        for i, d in enumerate((1, 3, 9)):
            x = FACodecResUnit(in_ch, d, name=f"res_{i}")(x)
        x = AliasFreeActivation1d(in_ch, name="act")(x)
        s = self.stride
        return WNConv1d(self.out_ch, 2 * s, stride=s,
                        padding=math.ceil(s / 2), name="down")(x)


class FACodecEncoder(nn.Module):
    """(reference: facodec.py:159-215). (B, 1, T) -> (B, D, T/hop)."""

    ngf: int = 32
    up_ratios: Sequence[int] = (2, 4, 5, 5)
    out_channels: int = 256

    @property
    def hop_length(self) -> int:
        r = 1
        for s in self.up_ratios:
            r *= int(s)
        return r

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = jnp.swapaxes(x, 1, 2)
        d = self.ngf
        h = WNConv1d(d, 7, padding=3, name="stem")(h)
        for i, s in enumerate(self.up_ratios):
            d *= 2
            h = FACodecEncoderBlock(d, s, name=f"block_{i}")(h)
        h = AliasFreeActivation1d(d, name="act")(h)
        h = WNConv1d(self.out_channels, 3, padding=1, name="head")(h)
        return jnp.swapaxes(h, 1, 2)


class FACodecDecoderBlock(nn.Module):
    """(reference: facodec.py:222-241 DecoderBlock): act -> transposed
    conv (kernel 2s, padding ceil(s/2), output_padding s%2) -> three
    dilated residual units."""

    out_ch: int
    stride: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        x = AliasFreeActivation1d(in_ch, name="act")(x)
        s = self.stride
        x = WNConvTranspose1d(self.out_ch, 2 * s, stride=s,
                              padding=math.ceil(s / 2),
                              output_padding=s % 2, name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = FACodecResUnit(self.out_ch, d, name=f"res_{i}")(x)
        return x


class FacodecTimbreEncoder(nn.Module):
    """Timbre transformer over encoder frames (reference:
    src/models/facodec/transformer.py:154-234, instantiated in
    facodec.py:358-368 with 4 layers, hidden 256, 4 heads, conv-FFN
    filter 1024 kernel 5): post-LN-free pre-norm self-attention +
    FastSpeech-style conv FFN, final LayerNorm. (B, T, D) -> (B, T, D);
    the decoder mean-pools it into the speaker embedding.

    Faithfulness notes: the reference's PositionalEncoding builds a
    (max_len, 1, d) table for time-major input but is applied to
    batch-first input as ``x + pe[:batch]`` (transformer.py:49-51), so
    each batch item receives the sinusoid of its *batch index* as a
    constant over time -- reproduced literally here for numerical
    parity. Dropout (0.1 at train in the reference) is omitted: this
    module is used for inference/import parity, not trained here."""

    hidden: int = 256
    num_layers: int = 4
    num_heads: int = 4
    filter_size: int = 1024
    kernel_size: int = 5

    def _attention(self, i: int, x: Array) -> Array:
        """torch nn.MultiheadAttention (batch_first): fused qkv
        projection + out projection, scale 1/sqrt(head_dim)."""
        b, t, d = x.shape
        h = self.num_heads
        dh = d // h
        qkv = nn.Dense(3 * d, name=f"qkv_{i}")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dh)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, d)
        return nn.Dense(d, name=f"out_{i}")(out)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, d = x.shape[0], x.shape[2]
        assert d == self.hidden, "timbre encoder runs at the codec width"
        # the reference's literal pe[:batch] quirk (see class docstring)
        pos = jnp.arange(b)[:, None] * jnp.exp(
            jnp.arange(0, d, 2) * (-math.log(10000.0) / d))[None, :]
        pe = jnp.zeros((b, d)).at[:, 0::2].set(jnp.sin(pos))
        pe = pe.at[:, 1::2].set(jnp.cos(pos))
        x = x + pe[:, None, :]
        for i in range(self.num_layers):
            a = nn.LayerNorm(epsilon=1e-5, name=f"ln1_{i}")(x)
            x = x + self._attention(i, a)
            f = nn.LayerNorm(epsilon=1e-5, name=f"ln2_{i}")(x)
            f = nn.Conv(self.filter_size, (self.kernel_size,),
                        padding=self.kernel_size // 2,
                        name=f"ffn1_{i}")(f)
            x = x + nn.Dense(self.hidden, name=f"ffn2_{i}")(
                jax.nn.relu(f))
        return nn.LayerNorm(epsilon=1e-5, name="ln_out")(x)


class WNDense(nn.Module):
    """Weight-normalized Linear matching torch.nn.utils.weight_norm
    (nn.Linear): v (in, out) direction (torch weight_v.T), g (out,)
    magnitude, norm over the input axis per output unit."""

    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_dim = x.shape[-1]
        # torch Linear default gain (see oobleck._torch_conv_init)
        v = self.param("v", nn.initializers.variance_scaling(
            1.0 / 3.0, "fan_in", "uniform"),
                       (in_dim, self.out_dim))
        g = self.param(
            "g", lambda key, shape: jnp.sqrt(
                jnp.sum(v.astype(jnp.float32) ** 2, axis=0)),
            (self.out_dim,))
        norm = jnp.sqrt(jnp.sum(v.astype(jnp.float32) ** 2, axis=0,
                                keepdims=True) + 1e-12)
        y = x @ ((v / norm) * g[None, :])
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.out_dim,))
        return y


class FactorizedVQ(nn.Module):
    """Factorized vector quantizer (reference:
    src/models/facodec/quantize/fvq.py:16-120): weight-normed linear
    projection into the low-dim codebook space, nearest code under the
    *l2-normalized* distance, but the selected code vector is the RAW
    codebook embedding (fvq.py:103-120 decode_latents embeds the index,
    not the normalized row); straight-through in the codebook space,
    then weight-normed projection back up. Commitment/codebook losses
    follow fvq.py:66-74 (per-batch-item means, commitment-weighted;
    zero when not ``train``, matching the reference eval path)."""

    dim: int
    codebook_size: int = 1024
    codebook_dim: int = 8
    commitment: float = 0.005  # reference vq_commit_weight

    def setup(self):
        self.proj_in = WNDense(self.codebook_dim, name="proj_in")
        self.proj_out = WNDense(self.dim, name="proj_out")
        self.codebook = self.param(
            "codebook", nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim))

    def __call__(self, x: Array, train: bool = False
                 ) -> Tuple[Array, Array, Array]:
        """x: (B, T, D) -> (quantized (B,T,D), indices (B,T), loss (B,))."""
        z_e = self.proj_in(x)
        zn = z_e / jnp.clip(jnp.linalg.norm(z_e, axis=-1, keepdims=True),
                            min=1e-12)
        cb = self.codebook / jnp.clip(
            jnp.linalg.norm(self.codebook, axis=-1, keepdims=True),
            min=1e-12)
        idx = jnp.argmax(zn @ cb.T, axis=-1)  # min l2 == max cosine
        z_q = self.codebook[idx]  # RAW embedding (fvq.py:116-120)
        if train:
            commit = self.commitment * jnp.mean(
                (z_e - jax.lax.stop_gradient(z_q)) ** 2, axis=(1, 2))
            codebook_loss = jnp.mean(
                (z_q - jax.lax.stop_gradient(z_e)) ** 2, axis=(1, 2))
            loss = commit + codebook_loss
        else:
            loss = jnp.zeros((x.shape[0],), x.dtype)
        z_st = z_e + jax.lax.stop_gradient(z_q - z_e)
        return self.proj_out(z_st), idx, loss

    def lookup(self, idx: Array) -> Array:
        """Codes (B, T) -> embeddings (B, T, D)
        (reference: fvq.py:86-90 vq2emb: raw embed -> out_proj)."""
        return self.proj_out(self.codebook[idx])


class FacodecRVQ(nn.Module):
    """Residual stack of factorized VQs
    (reference: src/models/facodec/quantize/rvq.py:12-73): layer i
    quantizes the residual left by layers < i; outputs sum. Per-layer
    codes and losses are returned stacked."""

    num_quantizers: int
    dim: int
    codebook_size: int = 1024
    codebook_dim: int = 8
    commitment: float = 0.005

    def setup(self):
        self.layers = [FactorizedVQ(self.dim, self.codebook_size,
                                    self.codebook_dim, self.commitment,
                                    name=f"vq_{i}")
                       for i in range(self.num_quantizers)]

    def __call__(self, x: Array, n_quantizers: Optional[int] = None,
                 train: bool = False):
        """x: (B, T, D) -> (quantized_out, codes (nq, B, T), losses (nq,)).
        ``n_quantizers`` statically caps the active depth (reference
        rvq.py:50-51 eval-path break); per-layer losses are batch means
        (rvq.py:64-66)."""
        n = self.num_quantizers if n_quantizers is None else min(
            int(n_quantizers), self.num_quantizers)
        out = jnp.zeros_like(x)
        residual = x
        codes, losses = [], []
        for i in range(n):
            q, idx, loss = self.layers[i](residual, train=train)
            residual = residual - q
            out = out + q
            codes.append(idx)
            losses.append(jnp.mean(loss))
        return out, jnp.stack(codes), jnp.stack(losses)

    def lookup(self, codes: Array) -> Array:
        """(nq, B, T) codes -> summed embeddings (B, T, D)
        (reference: rvq.py:75-82 vq2emb)."""
        out = 0.0
        for i in range(min(codes.shape[0], self.num_quantizers)):
            out = out + self.layers[i].lookup(codes[i])
        return out


class CNNLSTMHead(nn.Module):
    """Frame/utterance predictor head: three dilated snake residual units
    then per-head linear projections (reference: facodec.py:37-57 CNNLSTM
    -- despite the name it contains no LSTM). Input (B, T, D);
    ``global_pred`` mean-pools time before the heads."""

    out_dim: int
    num_heads: int = 1
    global_pred: bool = False

    @nn.compact
    def __call__(self, x: Array):
        d = x.shape[-1]
        for i, dil in enumerate((1, 2, 3)):
            x = FACodecResUnit(d, dil, name=f"res_{i}")(x)
        x = AliasFreeActivation1d(d, name="act")(x)
        if self.global_pred:
            x = jnp.mean(x, axis=1)
        return tuple(nn.Dense(self.out_dim, name=f"head_{i}")(x)
                     for i in range(self.num_heads))


class FACodecDecoder(nn.Module):
    """Grouped quantization + timbre-conditioned decoding
    (reference: facodec.py:244-601). Three quantizer groups with distinct
    roles: prosody (vq_num_q_p) and content (vq_num_q_c) both quantize
    the encoder output independently; the residual/acoustic group
    (vq_num_q_r) quantizes what they leave behind. Decoding FiLMs the
    (detached-prosody + detached-content + optionally masked residual)
    sum with a speaker embedding pooled from the timbre transformer, then
    upsamples through alias-free snake blocks to audio. Supervision heads
    (F0/uv on prosody, phone on content) and gradient-reversal
    disentanglement heads mirror facodec.py:374-407/477-511. Voice
    conversion: ``decode_with_timbre(z, speaker_embedding)`` reproduces
    the reference ``inference`` (facodec.py:570-578)."""

    in_channels: int = 256
    ngf: int = 32
    up_ratios: Sequence[int] = (5, 5, 4, 2)
    # width of the decoder stem; halves per upsampling block (reference:
    # facodec.py:339-346; the shipped FACodec wrapper passes 1024,
    # facodec.py:630; the class default there is 1536). None keeps the
    # compact ngf-derived schedule (ngf * 2^len(up_ratios)).
    upsample_initial_channel: Optional[int] = None
    vq_num_q_p: int = 1
    vq_num_q_c: int = 2
    vq_num_q_r: int = 3
    codebook_size: int = 1024
    codebook_dim: int = 8
    phone_classes: int = 5003
    timbre_layers: int = 4
    timbre_heads: int = 4
    gr_alpha: float = 1.0
    use_gr_content_f0: bool = False
    use_gr_prosody_phone: bool = False
    use_gr_residual_f0: bool = False
    use_gr_residual_phone: bool = False
    use_gr_x_timbre: bool = False
    num_speakers: int = 0  # >0 enables the x-timbre speaker GR head
    prob_random_mask_residual: float = 0.75

    def setup(self):
        D = self.in_channels
        self.q_prosody = FacodecRVQ(self.vq_num_q_p, D,
                                    self.codebook_size, self.codebook_dim)
        self.q_content = FacodecRVQ(self.vq_num_q_c, D,
                                    self.codebook_size, self.codebook_dim)
        if self.vq_num_q_r > 0:
            self.q_residual = FacodecRVQ(self.vq_num_q_r, D,
                                         self.codebook_size,
                                         self.codebook_dim)
        self.timbre_encoder = FacodecTimbreEncoder(
            hidden=D, num_layers=self.timbre_layers,
            num_heads=self.timbre_heads)
        self.timbre_film = nn.Dense(
            2 * D, name="timbre_film",
            bias_init=lambda k, s, d=None: jnp.concatenate(
                [jnp.ones((s[0] // 2,)), jnp.zeros((s[0] - s[0] // 2,))]))
        self.f0_head = CNNLSTMHead(1, num_heads=2)
        self.phone_head = CNNLSTMHead(self.phone_classes, num_heads=1)
        if self.use_gr_content_f0:
            self.content_f0_head = CNNLSTMHead(1, num_heads=2)
        if self.use_gr_prosody_phone:
            self.prosody_phone_head = CNNLSTMHead(self.phone_classes,
                                                  num_heads=1)
        if self.vq_num_q_r > 0 and self.use_gr_residual_f0:
            self.res_f0_head = CNNLSTMHead(1, num_heads=2)
        if self.vq_num_q_r > 0 and self.use_gr_residual_phone:
            self.res_phone_head = CNNLSTMHead(self.phone_classes,
                                              num_heads=1)
        if self.use_gr_x_timbre:
            assert self.num_speakers > 0, (
                "x-timbre GR head needs num_speakers")
            self.x_timbre_head = CNNLSTMHead(self.num_speakers,
                                             num_heads=1, global_pred=True)
        # the upsampling stack (shared by __call__ and decode_with_timbre)
        d = (self.upsample_initial_channel
             if self.upsample_initial_channel is not None
             else self.ngf * (2 ** len(self.up_ratios)))
        self.dec_stem = WNConv1d(d, 7, padding=3, name="dec_stem")
        blocks = []
        for i, s in enumerate(self.up_ratios):
            d //= 2
            blocks.append(FACodecDecoderBlock(d, int(s),
                                              name=f"dec_block_{i}"))
        self.dec_blocks = blocks
        self.dec_act = AliasFreeActivation1d(d, name="dec_act")
        self.dec_head = WNConv1d(1, 7, padding=3, name="dec_head")

    @property
    def num_quantizers(self) -> int:
        return self.vq_num_q_p + self.vq_num_q_c + self.vq_num_q_r

    def quantize(self, x: Array, n_quantizers: Optional[int] = None,
                 train: bool = False):
        """x: (B, T, D) NTC. Returns (out_sum, codes (nq_total, B, T),
        losses (nq_total,), [q_p, q_c, (q_r)] per-group sums)
        (reference: facodec.py:410-448)."""
        qp, cp, lp = self.q_prosody(x, n_quantizers, train=train)
        qc, cc, lc = self.q_content(x, n_quantizers, train=train)
        outs = qp + qc
        codes = [cp, cc]
        losses = [lp, lc]
        groups = [qp, qc]
        if self.vq_num_q_r > 0:
            res_in = x - jax.lax.stop_gradient(qp + qc)
            qr, cr, lr = self.q_residual(res_in, n_quantizers, train=train)
            outs = outs + qr
            codes.append(cr)
            losses.append(lr)
            groups.append(qr)
        return (outs, jnp.concatenate(codes, axis=0),
                jnp.concatenate(losses, axis=0), groups)

    def _decode_core(self, z: Array, spk: Array) -> Array:
        """FiLM with the speaker embedding, then the upsampling stack
        (reference: facodec.py:513-556 + the nn.Sequential model)."""
        D = z.shape[-1]
        style = self.timbre_film(spk)  # (B, 2D); bias init = (ones|zeros)
        gamma, beta = style[:, None, :D], style[:, None, D:]
        mean = jnp.mean(z, axis=-1, keepdims=True)
        var = jnp.var(z, axis=-1, keepdims=True)
        z = (z - mean) * jax.lax.rsqrt(var + 1e-5)  # LN, no affine
        z = z * gamma + beta
        z = self.dec_stem(z)
        for blk in self.dec_blocks:
            z = blk(z)
        z = self.dec_act(z)
        z = self.dec_head(z)
        return jnp.tanh(jnp.swapaxes(z, 1, 2))

    def __call__(self, h: Array, *, speaker_embedding: Optional[Array]
                 = None, n_quantizers: Optional[int] = None,
                 train: bool = False, return_info: bool = False):
        """h: encoder output (B, D, T) -> decoded (B, 1, T*hop).

        With ``return_info``: also a dict with per-group codes/losses, the
        pooled speaker embedding, F0/uv/phone predictions and any enabled
        gradient-reversal head outputs. ``train`` enables the random
        residual-group mask (reference: facodec.py:515-540; needs an
        ``rvq_mask`` rng)."""
        x = jnp.swapaxes(h, 1, 2)  # (B, T, D)
        _, codes, losses, groups = self.quantize(x, n_quantizers,
                                                 train=train)

        spk_from_x = jnp.mean(self.timbre_encoder(x), axis=1)
        spk = (spk_from_x if speaker_embedding is None
               else speaker_embedding)

        info = {"vq_loss": jnp.sum(losses), "vq_losses": losses,
                "indices": jnp.moveaxis(codes, 0, -1),  # (B, T, nq)
                "codes": codes, "spk_embs": spk_from_x}

        # supervision + disentanglement heads (facodec.py:477-511)
        f0, uv = self.f0_head(groups[0])
        info["f0"], info["uv"] = f0[..., 0], uv[..., 0]
        (info["phone"],) = self.phone_head(groups[1])
        if self.use_gr_prosody_phone:
            (info["prosody_phone"],) = self.prosody_phone_head(
                gradient_reversal(groups[0], self.gr_alpha))
        if self.use_gr_content_f0:
            cf0, cuv = self.content_f0_head(
                gradient_reversal(groups[1], self.gr_alpha))
            info["content_f0"], info["content_uv"] = \
                cf0[..., 0], cuv[..., 0]
        if self.vq_num_q_r > 0 and self.use_gr_residual_f0:
            rf0, ruv = self.res_f0_head(
                gradient_reversal(groups[2], self.gr_alpha))
            info["res_f0"], info["res_uv"] = rf0[..., 0], ruv[..., 0]
        if self.vq_num_q_r > 0 and self.use_gr_residual_phone:
            (info["res_phone"],) = self.res_phone_head(
                gradient_reversal(groups[2], self.gr_alpha))

        z = (jax.lax.stop_gradient(groups[0])
             + jax.lax.stop_gradient(groups[1]))
        if self.vq_num_q_r > 0:
            qr = groups[2]
            if train and self.prob_random_mask_residual > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("rvq_mask"),
                    1.0 - self.prob_random_mask_residual,
                    (qr.shape[0], 1, 1))
                qr = qr * keep.astype(qr.dtype)
            z = z + qr

        if self.use_gr_x_timbre:
            (info["x_timbre"],) = self.x_timbre_head(
                gradient_reversal(z, self.gr_alpha))

        audio = self._decode_core(z, spk)
        if return_info:
            return audio, info
        return audio

    def vq2emb(self, codes: Array) -> Array:
        """Codes (nq_total, B, T) -> summed embedding (B, D, T)
        (reference: facodec.py:558-568)."""
        p, c = self.vq_num_q_p, self.vq_num_q_c
        out = self.q_prosody.lookup(codes[:p])
        out = out + self.q_content.lookup(codes[p:p + c])
        if self.vq_num_q_r > 0 and codes.shape[0] > p + c:
            out = out + self.q_residual.lookup(codes[p + c:])
        return jnp.swapaxes(out, 1, 2)

    def decode_with_timbre(self, z: Array, speaker_embedding: Array
                           ) -> Array:
        """Voice conversion: decode embedding (B, D, T) under another
        speaker's embedding (reference: facodec.py:570-578 inference)."""
        return self._decode_core(jnp.swapaxes(z, 1, 2),
                                 speaker_embedding)
