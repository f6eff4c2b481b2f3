"""Native SepFormer oracle tests.

The reference only shells out to the pretrained SpeechBrain model as an
external baseline (reference: scripts/sepformer.py:1-20); here the
architecture (Subakan et al. 2021) is implemented natively, so parity is
established against an in-repo torch twin that mirrors
speechbrain.lobes.models.dual_path line-for-line (same module tree and
state-dict key layout as the published sepformer-wsj02mix checkpoint).
The twin's state dict feeds :func:`sepformer_params_from_torch`, which
validates both the JAX model's semantics and the importer's key mapping
in one shot — the pattern used by the NCSN++/Oobleck/DAU1d oracles.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from ditsep_tpu.models.sepformer import (
    SepFormer, overlap_add_chunks, segment_chunks,
    sepformer_params_from_torch)

# tiny config: same topology as sepformer-wsj02mix, scaled down
CFG = dict(num_spks=2, enc_channels=16, out_channels=16, kernel_size=16,
           stride=8, chunk_size=10, num_dp_layers=2, num_tf_layers=2,
           n_heads=4, d_ffn=32)


def _pe(length, d):
    """speechbrain PositionalEncoding table (1, length, d)."""
    pos = torch.arange(length, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                    * (-math.log(10000.0) / d))
    pe = torch.zeros(length, d)
    pe[:, 0::2] = torch.sin(pos * div)
    pe[:, 1::2] = torch.cos(pos * div)
    return pe[None]


class _LN(tnn.Module):
    """sb.nnet.normalization.LayerNorm (key: .norm)."""

    def __init__(self, d):
        super().__init__()
        self.norm = tnn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        return self.norm(x)


class _MHA(tnn.Module):
    """sb.nnet.attention.MultiheadAttention (key: .att)."""

    def __init__(self, d, heads):
        super().__init__()
        self.att = tnn.MultiheadAttention(d, heads, batch_first=True)

    def forward(self, x):
        return self.att(x, x, x, need_weights=False)[0]


class _FFN(tnn.Module):
    """sb PositionalwiseFeedForward (keys: .ffn.0 / .ffn.3)."""

    def __init__(self, d, d_ffn):
        super().__init__()
        self.ffn = tnn.Sequential(tnn.Linear(d, d_ffn), tnn.ReLU(),
                                  tnn.Dropout(0.0), tnn.Linear(d_ffn, d))

    def forward(self, x):
        return self.ffn(x)


class _TELayer(tnn.Module):
    """sb TransformerEncoderLayer with normalize_before=True (pre-LN)."""

    def __init__(self, d, heads, d_ffn):
        super().__init__()
        self.self_att = _MHA(d, heads)
        self.pos_ffn = _FFN(d, d_ffn)
        self.norm1 = _LN(d)
        self.norm2 = _LN(d)

    def forward(self, x):
        x = x + self.self_att(self.norm1(x))
        return x + self.pos_ffn(self.norm2(x))


class _TEncoder(tnn.Module):
    """sb TransformerEncoder (key prefix: .mdl) with closing norm."""

    def __init__(self, n, d, heads, d_ffn):
        super().__init__()
        self.layers = tnn.ModuleList(
            _TELayer(d, heads, d_ffn) for _ in range(n))
        self.norm = _LN(d)

    def forward(self, x):
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)


class _SBBlock(tnn.Module):
    """sb SBTransformerBlock with use_positional_encoding=True."""

    def __init__(self, n, d, heads, d_ffn):
        super().__init__()
        self.mdl = _TEncoder(n, d, heads, d_ffn)

    def forward(self, x):
        return self.mdl(x + _pe(x.shape[1], x.shape[2]))


class _DPBlock(tnn.Module):
    """sb Dual_Computation_Block, skip_around_intra=True,
    linear_layer_after_inter_intra=False (the wsj02mix hyperparams)."""

    def __init__(self, n, d, heads, d_ffn):
        super().__init__()
        self.intra_mdl = _SBBlock(n, d, heads, d_ffn)
        self.inter_mdl = _SBBlock(n, d, heads, d_ffn)
        self.intra_norm = tnn.GroupNorm(1, d, eps=1e-8)
        self.inter_norm = tnn.GroupNorm(1, d, eps=1e-8)

    def forward(self, x):  # (B, N, K, S)
        B, N, K, S = x.shape
        intra = x.permute(0, 3, 2, 1).reshape(B * S, K, N)
        intra = self.intra_mdl(intra)
        intra = intra.view(B, S, K, N).permute(0, 3, 2, 1)
        intra = self.intra_norm(intra) + x
        inter = intra.permute(0, 2, 3, 1).reshape(B * K, S, N)
        inter = self.inter_mdl(inter)
        inter = inter.view(B, K, S, N).permute(0, 3, 1, 2)
        return self.inter_norm(inter) + intra


class _MaskNet(tnn.Module):
    """sb Dual_Path_Model with use_global_pos_enc=True, norm='ln'."""

    def __init__(self, N, out, spks, K, dp_layers, tf_layers, heads,
                 d_ffn):
        super().__init__()
        self.K, self.spks, self.out = K, spks, out
        self.norm = tnn.GroupNorm(1, N, eps=1e-8)
        self.conv1d = tnn.Conv1d(N, out, 1, bias=False)
        self.dual_mdl = tnn.ModuleList(
            _DPBlock(tf_layers, out, heads, d_ffn)
            for _ in range(dp_layers))
        self.prelu = tnn.PReLU()
        self.conv2d = tnn.Conv2d(out, out * spks, 1)
        self.output = tnn.Sequential(tnn.Conv1d(out, out, 1), tnn.Tanh())
        self.output_gate = tnn.Sequential(tnn.Conv1d(out, out, 1),
                                          tnn.Sigmoid())
        self.end_conv1x1 = tnn.Conv1d(out, N, 1, bias=False)

    @staticmethod
    def _segment(x, K):  # speechbrain _Segmentation, verbatim semantics
        B, N, L = x.shape
        P = K // 2
        gap = K - (P + L % K) % K
        if gap > 0:
            x = torch.cat([x, torch.zeros(B, N, gap)], dim=2)
        pad = torch.zeros(B, N, P)
        x = torch.cat([pad, x, pad], dim=2)
        x1 = x[:, :, :-P].reshape(B, N, -1, K)
        x2 = x[:, :, P:].reshape(B, N, -1, K)
        x = torch.cat([x1, x2], dim=3).view(B, N, -1, K).transpose(2, 3)
        return x.contiguous(), gap

    @staticmethod
    def _over_add(x, gap):  # speechbrain _over_add
        B, N, K, S = x.shape
        P = K // 2
        x = x.transpose(2, 3).contiguous().view(B, N, -1, K * 2)
        x1 = x[:, :, :, :K].contiguous().view(B, N, -1)[:, :, P:]
        x2 = x[:, :, :, K:].contiguous().view(B, N, -1)[:, :, :-P]
        x = x1 + x2
        if gap > 0:
            x = x[:, :, :-gap]
        return x

    def forward(self, x):  # (B, N, L) -> (B, spks, N, L)
        B = x.shape[0]
        x = self.norm(x)
        x = self.conv1d(x)
        x = (_pe(x.shape[-1], self.out).transpose(1, 2)
             + x * (x.size(1) ** 0.5))
        x, gap = self._segment(x, self.K)
        for blk in self.dual_mdl:
            x = blk(x)
        x = self.prelu(x)
        x = self.conv2d(x)
        _, _, K, S = x.shape
        x = x.reshape(B * self.spks, -1, K, S)
        x = self._over_add(x, gap)
        x = self.output(x) * self.output_gate(x)
        x = self.end_conv1x1(x)
        _, N2, L2 = x.shape
        return torch.relu(x.view(B, self.spks, N2, L2))


class _Encoder(tnn.Module):
    def __init__(self, N, K, stride):
        super().__init__()
        self.conv1d = tnn.Conv1d(1, N, K, stride=stride, bias=False)

    def forward(self, x):  # (B, T) -> (B, N, L)
        return torch.relu(self.conv1d(x[:, None]))


class _Twin(tnn.Module):
    """encoder / masknet / decoder under the SpeechBrain module names,
    forward = SepformerSeparation.separate_batch semantics."""

    def __init__(self, cfg):
        super().__init__()
        self.spks = cfg["num_spks"]
        self.encoder = _Encoder(cfg["enc_channels"], cfg["kernel_size"],
                                cfg["stride"])
        self.masknet = _MaskNet(
            cfg["enc_channels"], cfg["out_channels"], cfg["num_spks"],
            cfg["chunk_size"], cfg["num_dp_layers"], cfg["num_tf_layers"],
            cfg["n_heads"], cfg["d_ffn"])
        self.decoder = tnn.ConvTranspose1d(
            cfg["enc_channels"], 1, cfg["kernel_size"],
            stride=cfg["stride"], bias=False)

    def forward(self, mix):  # (B, T) -> (B, spks, T)
        T = mix.shape[1]
        h = self.encoder(mix)
        mask = self.masknet(h)
        sep = h[:, None] * mask
        B, spks, N, L = sep.shape
        est = self.decoder(sep.reshape(B * spks, N, L))[:, 0]
        if est.shape[-1] >= T:
            est = est[..., :T]
        else:
            est = F.pad(est, (0, T - est.shape[-1]))
        return est.view(B, spks, T)


def test_chunk_roundtrip():
    """50%-overlap segmentation then overlap-add doubles the signal
    (each sample lands in exactly two chunks) and restores the length —
    including the gap==K edge case speechbrain pads a full chunk for."""
    rng = np.random.default_rng(0)
    for L in (45, 47, 50):  # L%K==P (gap=K), ragged, exact-multiple
        x = jnp.asarray(rng.normal(size=(2, L, 3)).astype(np.float32))
        seg, gap = segment_chunks(x, 10)
        out = overlap_add_chunks(seg, gap)
        np.testing.assert_allclose(np.asarray(out), 2 * np.asarray(x),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("T", [368, 403])
def test_sepformer_torch_parity(T):
    """Full forward parity vs the torch twin via the checkpoint
    importer. T=368 makes the masknet hit speechbrain's gap==K
    segmentation edge case; T=403 is a ragged length."""
    torch.manual_seed(0)
    twin = _Twin(CFG).eval()
    model = SepFormer(**CFG)
    params = sepformer_params_from_torch(dict(twin.state_dict()), model)
    mix = (np.random.default_rng(1).normal(size=(2, T)) * 0.1
           ).astype(np.float32)
    with torch.no_grad():
        out_t = twin(torch.from_numpy(mix)).numpy()
    out_j = np.asarray(model.apply(params, jnp.asarray(mix)))
    assert out_j.shape == out_t.shape == (2, 2, T)
    np.testing.assert_allclose(out_j, out_t, rtol=2e-3, atol=2e-4)


def test_sepformer_baseline_cli_native(tmp_path):
    """e2e: SpeechBrain savedir-layout checkpoint (per-module files) ->
    native CLI -> s0/s1 wavs, outputs matching the imported model."""
    import json

    from ditsep_tpu.cli.sepformer_baseline import main as cli_main
    from ditsep_tpu.data.wsj0_mix import read_wav, write_wav

    torch.manual_seed(0)
    twin = _Twin(CFG).eval()
    ckpt = tmp_path / "savedir"
    ckpt.mkdir()
    torch.save(twin.encoder.state_dict(), ckpt / "encoder.ckpt")
    torch.save(twin.masknet.state_dict(), ckpt / "masknet.ckpt")
    torch.save(twin.decoder.state_dict(), ckpt / "decoder.ckpt")

    rng = np.random.default_rng(3)
    in_dir, out_dir = tmp_path / "in", tmp_path / "out"
    in_dir.mkdir()
    mix = (rng.normal(size=300) * 0.1).astype(np.float32)
    write_wav(str(in_dir / "utt0.wav"), mix, 8000)
    cli_main(["--input", str(in_dir), "--output", str(out_dir),
              "--ckpt", str(ckpt), "--bucket", "64",
              "--model-kwargs", json.dumps(CFG)])

    mix_read, _ = read_wav(str(in_dir / "utt0.wav"))
    T = mix_read.shape[-1]
    pad = (-T) % 64
    model = SepFormer(**CFG)
    params = sepformer_params_from_torch(dict(twin.state_dict()), model)
    ref = np.asarray(model.apply(
        params, jnp.asarray(np.pad(mix_read, (0, pad))[None])))[0, :, :T]
    ref = ref / np.maximum(np.abs(ref).max(axis=-1, keepdims=True), 1e-8)
    for s in range(2):
        est, fs = read_wav(str(out_dir / f"s{s}" / "utt0.wav"))
        assert fs == 8000 and est.shape[-1] == T
        # int16 wav quantization bounds the roundtrip error
        np.testing.assert_allclose(est, ref[s], atol=2e-4)


def test_sepformer_jit_and_grad():
    """The whole model jits as one program and trains: finite loss +
    nonzero grads through encoder, masknet and decoder."""
    model = SepFormer(**CFG)
    mix = jax.random.normal(jax.random.PRNGKey(0), (2, 200)) * 0.1
    params = model.init(jax.random.PRNGKey(1), mix)
    fwd = jax.jit(lambda p, m: model.apply(p, m))
    out = fwd(params, mix)
    assert out.shape == (2, 2, 200)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fwd(params, mix)),
                               rtol=0, atol=0)  # deterministic

    tgt = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 200))
    loss = lambda p: jnp.mean((model.apply(p, mix) - tgt) ** 2)
    g = jax.grad(loss)(params)
    leaves = jax.tree.leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    assert any(float(jnp.abs(x).max()) > 0 for x in leaves)


def test_sepformer_rejects_non_dividing_stride():
    """The matmul+overlap_add decoder lowering requires stride |
    kernel_size; fail with a clear message instead of an opaque
    reshape error (torch's ConvTranspose1d supports such configs)."""
    import jax
    import jax.numpy as jnp
    import pytest as _pytest

    from ditsep_tpu.models.sepformer import SepFormer

    m = SepFormer(kernel_size=16, stride=6, enc_channels=8,
                  n_heads=2, d_ffn=16, chunk_size=10,
                  num_dp_layers=1, num_tf_layers=1)
    with _pytest.raises(ValueError, match="divide"):
        m.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 320)))
