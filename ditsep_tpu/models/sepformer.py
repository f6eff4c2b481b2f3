"""SepFormer: dual-path transformer masking separation, TPU-native.

The reference treats SepFormer purely as an external comparison baseline,
shelling out to the pretrained SpeechBrain model on a GPU host
(reference: scripts/sepformer.py:1-20). That leaves the baseline
unusable wherever speechbrain/torch-GPU isn't available — and never on
TPU. Here the architecture itself (Subakan et al. 2021, "Attention is
All You Need in Speech Separation") is implemented natively:

  waveform -> Conv1d(kernel 16, stride 8) encoder -> dual-path masknet
  (50%%-overlap chunking; per-chunk "intra" and cross-chunk "inter"
  pre-LN transformer stacks) -> per-source multiplicative masks ->
  ConvTranspose1d decoder.

TPU-first design notes:
  * everything is static-shape; chunk segmentation / overlap-add are
    pure reshape+pad+add (no scatter, which serializes on TPU);
  * the decoder's ConvTranspose1d is lowered as ONE (B*L, N)x(N, K)
    matmul followed by the shared :func:`ditsep_tpu.ops.stft.overlap_add`
    (MXU matmul + vector adds instead of a gradient-of-conv lowering);
  * intra/inter attention runs as large batched (B*S, K, d) einsums --
    exactly the shape XLA tiles well onto the MXU;
  * the whole ``__call__`` jits as a single program, so separation is
    one dispatch per bucket shape (the serving engine / eval harness
    can batch it like the diffusion models).

Module layout and parameter naming deliberately mirror SpeechBrain's
``sepformer-wsj02mix`` structure (encoder / masknet.dual_mdl.N.{intra,
inter}_mdl.mdl.layers.M / decoder) so the torch-checkpoint importer
:func:`sepformer_params_from_torch` maps the published pretrained
weights onto this model. The importer is oracle-tested against an
in-repo torch twin of the architecture (tests/test_sepformer.py);
loading real SpeechBrain checkpoints is weights-gated like the other
importers.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.models.backbones import PReLU
from ditsep_tpu.ops.stft import overlap_add

Array = jax.Array


def sinusoidal_positional_encoding(length: int, d_model: int) -> Array:
    """Classic fixed sin/cos table, (length, d_model).

    Matches speechbrain.lobes.models.transformer.Transformer
    PositionalEncoding: pe[:, 2i] = sin(pos / 10000^(2i/d)),
    pe[:, 2i+1] = cos(same angle)."""
    assert d_model % 2 == 0, "d_model must be even"
    pos = np.arange(length, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * (-np.log(10000.0) / d_model))
    pe = np.zeros((length, d_model), np.float32)
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div)
    return jnp.asarray(pe)


class SBTransformerLayer(nn.Module):
    """Pre-LN transformer encoder layer (normalize_before=True in the
    SpeechBrain hyperparams): x + MHA(LN(x)), then x + FFN(LN(x))."""

    d_model: int
    n_heads: int
    d_ffn: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            out_features=self.d_model, dtype=self.dtype,
            name="self_att")(h, h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = nn.Dense(self.d_ffn, dtype=self.dtype, name="ffn_1")(h)
        h = jax.nn.relu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ffn_2")(h)
        return x + h


class SBTransformerBlock(nn.Module):
    """Positional encoding + N pre-LN layers + final LayerNorm
    (speechbrain TransformerEncoder applies a closing norm after the
    stack when normalize_before)."""

    num_layers: int
    d_model: int
    n_heads: int
    d_ffn: int
    use_positional_encoding: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_positional_encoding:
            pe = sinusoidal_positional_encoding(x.shape[1], x.shape[2])
            x = x + pe[None].astype(x.dtype)
        for i in range(self.num_layers):
            x = SBTransformerLayer(self.d_model, self.n_heads, self.d_ffn,
                                   dtype=self.dtype, name=f"layer_{i}")(x)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(x)


class DualPathBlock(nn.Module):
    """One dual-computation block: intra-chunk transformer + norm + skip,
    then inter-chunk transformer + norm + skip. Input (B, K, S, N) with
    K = chunk length, S = number of chunks."""

    num_tf_layers: int
    d_model: int
    n_heads: int
    d_ffn: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h: Array) -> Array:
        b, k, s, n = h.shape
        # intra: attention along K within each chunk
        hi = h.transpose(0, 2, 1, 3).reshape(b * s, k, n)
        hi = SBTransformerBlock(self.num_tf_layers, self.d_model,
                                self.n_heads, self.d_ffn,
                                dtype=self.dtype, name="intra_mdl")(hi)
        hi = hi.reshape(b, s, k, n).transpose(0, 2, 1, 3)
        hi = nn.GroupNorm(num_groups=1, epsilon=1e-8, name="intra_norm")(hi)
        hi = hi + h
        # inter: attention along S across chunks
        he = hi.reshape(b * k, s, n)
        he = SBTransformerBlock(self.num_tf_layers, self.d_model,
                                self.n_heads, self.d_ffn,
                                dtype=self.dtype, name="inter_mdl")(he)
        he = he.reshape(b, k, s, n)
        he = nn.GroupNorm(num_groups=1, epsilon=1e-8, name="inter_norm")(he)
        return he + hi


def segment_chunks(x: Array, K: int) -> Tuple[Array, int]:
    """(B, L, N) -> (B, K, S, N) 50%%-overlap chunks + the zero `gap`
    appended so chunks tile evenly (speechbrain Dual_Path_Model
    _Segmentation, expressed as reshapes of two hop-P strided views).

    gap follows speechbrain exactly, INCLUDING its quirk of padding a
    full extra K-chunk when the remainder is already zero — the padded
    zero chunk is visible to inter-chunk attention, so checkpoint
    parity requires reproducing it."""
    b, L, n = x.shape
    P = K // 2
    gap = K - (P + L % K) % K
    if gap:
        x = jnp.pad(x, ((0, 0), (0, gap), (0, 0)))
    x = jnp.pad(x, ((0, 0), (P, P), (0, 0)))
    x1 = x[:, :-P].reshape(b, -1, K, n)
    x2 = x[:, P:].reshape(b, -1, K, n)
    seg = jnp.concatenate([x1, x2], axis=2).reshape(b, -1, K, n)
    return seg.transpose(0, 2, 1, 3), gap  # (B, K, S, N)


def overlap_add_chunks(seg: Array, gap: int) -> Array:
    """(B, K, S, N) -> (B, L, N): sum the two 50%%-overlap chunk streams
    back together (speechbrain _over_add)."""
    b, K, s, n = seg.shape
    P = K // 2
    x = seg.transpose(0, 2, 1, 3).reshape(b, s // 2, 2 * K, n)
    x1 = x[:, :, :K].reshape(b, -1, n)[:, P:]
    x2 = x[:, :, K:].reshape(b, -1, n)[:, :-P]
    out = x1 + x2
    if gap:
        out = out[:, :-gap]
    return out


class SepFormerMaskNet(nn.Module):
    """Dual-path mask estimation network (speechbrain Dual_Path_Model).
    (B, L, N) encoder features -> (B, num_spks, L, N) ReLU masks."""

    in_channels: int
    out_channels: int
    num_spks: int = 2
    chunk_size: int = 250
    num_dp_layers: int = 2
    num_tf_layers: int = 8
    n_heads: int = 8
    d_ffn: int = 1024
    use_global_pos_enc: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, L, _ = x.shape
        h = nn.GroupNorm(num_groups=1, epsilon=1e-8, name="norm")(x)
        h = nn.Dense(self.out_channels, use_bias=False,
                     dtype=self.dtype, name="conv1d")(h)
        if self.use_global_pos_enc:
            # speechbrain Dual_Path_Model: x = pos_enc(x) + x * sqrt(d)
            # (the published sepformer recipes set use_global_pos_enc)
            pe = sinusoidal_positional_encoding(L, self.out_channels)
            h = pe[None].astype(h.dtype) + h * jnp.sqrt(
                jnp.asarray(self.out_channels, h.dtype))
        seg, gap = segment_chunks(h, self.chunk_size)
        for i in range(self.num_dp_layers):
            seg = DualPathBlock(self.num_tf_layers, self.out_channels,
                                self.n_heads, self.d_ffn, dtype=self.dtype,
                                name=f"dual_{i}")(seg)
        seg = PReLU(name="prelu")(seg)
        seg = nn.Dense(self.out_channels * self.num_spks,
                       dtype=self.dtype, name="conv2d")(seg)
        k, s = seg.shape[1], seg.shape[2]
        # channel dim splits (spks, out) row-major, matching the torch
        # view(B*spks, out, K, S) of the conv2d output
        seg = seg.reshape(b, k, s, self.num_spks, self.out_channels)
        seg = seg.transpose(0, 3, 1, 2, 4).reshape(
            b * self.num_spks, k, s, self.out_channels)
        h = overlap_add_chunks(seg, gap)  # (B*spks, L, out)
        gate = jax.nn.sigmoid(
            nn.Dense(self.out_channels, dtype=self.dtype,
                     name="output_gate")(h))
        h = jnp.tanh(
            nn.Dense(self.out_channels, dtype=self.dtype,
                     name="output")(h)) * gate
        h = nn.Dense(self.in_channels, use_bias=False, dtype=self.dtype,
                     name="end_conv1x1")(h)
        h = jax.nn.relu(h)
        return h.reshape(b, self.num_spks, L, self.in_channels)


class SepFormer(nn.Module):
    """Full SepFormer separation model.

    ``__call__(mix)`` with mix (B, T) or (B, 1, T) float waveform
    returns (B, num_spks, T) separated estimates. Defaults follow the
    published sepformer-wsj02mix hyperparameters (256-dim encoder,
    kernel 16 / stride 8, chunk 250, 2 dual-path layers of 8-layer
    transformers with 8 heads and 1024-wide FFNs)."""

    num_spks: int = 2
    enc_channels: int = 256
    out_channels: int = 256
    kernel_size: int = 16
    stride: int = 8
    chunk_size: int = 250
    num_dp_layers: int = 2
    num_tf_layers: int = 8
    n_heads: int = 8
    d_ffn: int = 1024
    use_global_pos_enc: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, mix: Array) -> Array:
        if self.kernel_size % self.stride:
            # the decoder lowers ConvTranspose1d as matmul + overlap_add
            # (ops/stft.py), which reshapes each kernel into
            # kernel_size//stride hop-`stride` frames; torch supports
            # non-dividing strides, this lowering does not
            raise ValueError(
                f"SepFormer requires stride ({self.stride}) to divide "
                f"kernel_size ({self.kernel_size}); the SpeechBrain "
                "config (16, 8) satisfies this")
        if mix.ndim == 3:
            mix = mix[:, 0]
        b, T = mix.shape
        # encoder: strided conv + ReLU -> (B, L, N)
        h = nn.Conv(self.enc_channels, (self.kernel_size,),
                    strides=(self.stride,), padding="VALID",
                    use_bias=False, dtype=self.dtype,
                    name="encoder")(mix[..., None])
        h = jax.nn.relu(h)
        mask = SepFormerMaskNet(
            in_channels=self.enc_channels, out_channels=self.out_channels,
            num_spks=self.num_spks, chunk_size=self.chunk_size,
            num_dp_layers=self.num_dp_layers,
            num_tf_layers=self.num_tf_layers, n_heads=self.n_heads,
            d_ffn=self.d_ffn,
            use_global_pos_enc=self.use_global_pos_enc,
            dtype=self.dtype, name="masknet")(h)
        sep = h[:, None] * mask  # (B, spks, L, N)
        L = sep.shape[2]
        flat = sep.reshape(b * self.num_spks, L, self.enc_channels)
        # decoder: ConvTranspose1d(N->1, K, stride) lowered as one
        # (B*spks*L, N)x(N, K) matmul + hop-`stride` overlap-add
        w = self.param("decoder",
                       nn.initializers.lecun_normal(),
                       (self.enc_channels, self.kernel_size))
        frames = jnp.einsum("bln,nk->blk", flat,
                            w.astype(flat.dtype))
        y = overlap_add(frames, self.stride)  # (B*spks, (L+1)*stride)
        y = y.astype(jnp.float32)
        # match the input length exactly (speechbrain pads/cuts)
        t_est = y.shape[-1]
        if t_est >= T:
            y = y[..., :T]
        else:
            y = jnp.pad(y, ((0, 0), (0, T - t_est)))
        return y.reshape(b, self.num_spks, T)


# ---------------------------------------------------------------------------
# Torch checkpoint importer (SpeechBrain sepformer-* layout)
# ---------------------------------------------------------------------------

def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy().astype(np.float32)
    return np.asarray(x, np.float32)


def _mha_params(sd: Dict[str, Any], prefix: str, d: int, n_heads: int
                ) -> Dict[str, Any]:
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    hd = d // n_heads
    in_w = _t(sd[f"{prefix}.in_proj_weight"])   # (3d, d)
    in_b = _t(sd[f"{prefix}.in_proj_bias"])     # (3d,)
    out_w = _t(sd[f"{prefix}.out_proj.weight"])  # (d, d)
    out_b = _t(sd[f"{prefix}.out_proj.bias"])
    def head(w, b):
        return {"kernel": w.T.reshape(d, n_heads, hd),
                "bias": b.reshape(n_heads, hd)}
    return {
        "query": head(in_w[:d], in_b[:d]),
        "key": head(in_w[d:2 * d], in_b[d:2 * d]),
        "value": head(in_w[2 * d:], in_b[2 * d:]),
        "out": {"kernel": out_w.T.reshape(n_heads, hd, d), "bias": out_b},
    }


def _ln(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {"scale": _t(sd[f"{prefix}.weight"]),
            "bias": _t(sd[f"{prefix}.bias"])}


def _dense_1x1(sd: Dict[str, Any], key: str, bias: bool = True
               ) -> Dict[str, Any]:
    """torch Conv1d/Conv2d 1x1 weight (out, in, 1[, 1]) -> Dense."""
    w = _t(sd[f"{key}.weight"])
    w = w.reshape(w.shape[0], w.shape[1])
    p = {"kernel": w.T}
    if bias:
        p["bias"] = _t(sd[f"{key}.bias"])
    return p


def _tf_block(sd: Dict[str, Any], prefix: str, num_layers: int, d: int,
              n_heads: int) -> Dict[str, Any]:
    """speechbrain SBTransformerBlock (``<prefix>.mdl`` TransformerEncoder
    with sb wrapper modules: self_att.att, pos_ffn.ffn.{0,3},
    norm{1,2}.norm, closing mdl.norm.norm)."""
    out: Dict[str, Any] = {}
    for j in range(num_layers):
        lp = f"{prefix}.mdl.layers.{j}"
        out[f"layer_{j}"] = {
            "self_att": _mha_params(sd, f"{lp}.self_att.att", d, n_heads),
            "norm1": _ln(sd, f"{lp}.norm1.norm"),
            "norm2": _ln(sd, f"{lp}.norm2.norm"),
            "ffn_1": {"kernel": _t(sd[f"{lp}.pos_ffn.ffn.0.weight"]).T,
                      "bias": _t(sd[f"{lp}.pos_ffn.ffn.0.bias"])},
            "ffn_2": {"kernel": _t(sd[f"{lp}.pos_ffn.ffn.3.weight"]).T,
                      "bias": _t(sd[f"{lp}.pos_ffn.ffn.3.bias"])},
        }
    out["norm"] = _ln(sd, f"{prefix}.mdl.norm.norm")
    return out


def sepformer_params_from_torch(
    state: Dict[str, Any],
    model: SepFormer,
) -> Dict[str, Any]:
    """Map a SpeechBrain SepFormer state dict onto :class:`SepFormer`.

    ``state`` is one flat dict with the pretrained module prefixes
    ``encoder.`` / ``masknet.`` / ``decoder.`` (SpeechBrain saves the
    three modules as separate files; merge them with those prefixes --
    see cli/sepformer_baseline). Key layout follows speechbrain
    lobes.models.dual_path; oracle-tested against an in-repo torch twin
    in tests/test_sepformer.py."""
    d = model.out_channels
    nh = model.n_heads
    enc_w = _t(state["encoder.conv1d.weight"])       # (N, 1, K)
    dec_w = _t(state["decoder.weight"])              # (N, 1, K)
    masknet: Dict[str, Any] = {
        "norm": _ln(state, "masknet.norm"),
        "conv1d": {"kernel": _t(state["masknet.conv1d.weight"])[:, :, 0].T},
        "prelu": {"alpha": _t(state["masknet.prelu.weight"]).reshape(1)},
        "conv2d": _dense_1x1(state, "masknet.conv2d"),
        "output": _dense_1x1(state, "masknet.output.0"),
        "output_gate": _dense_1x1(state, "masknet.output_gate.0"),
        "end_conv1x1": {
            "kernel": _t(state["masknet.end_conv1x1.weight"])[:, :, 0].T},
    }
    for i in range(model.num_dp_layers):
        bp = f"masknet.dual_mdl.{i}"
        masknet[f"dual_{i}"] = {
            "intra_mdl": _tf_block(state, f"{bp}.intra_mdl",
                                   model.num_tf_layers, d, nh),
            "inter_mdl": _tf_block(state, f"{bp}.inter_mdl",
                                   model.num_tf_layers, d, nh),
            "intra_norm": _ln(state, f"{bp}.intra_norm"),
            "inter_norm": _ln(state, f"{bp}.inter_norm"),
        }
    params = {
        "encoder": {"kernel": enc_w.transpose(2, 1, 0)},
        "masknet": masknet,
        "decoder": dec_w[:, 0, :],
    }
    return {"params": jax.tree.map(jnp.asarray, params)}
