"""OobleckVAE tests: torch-semantics parity, bottleneck, chunked codec.

The oracle is an independent torch implementation of the Oobleck spec
(reference: src/stable_audio_tools/models/autoencoders.py:59-356), written
here from the documented structure with torch.nn.utils.weight_norm -- it
reproduces the reference's nn.Sequential key layout so the production
checkpoint importer (import_oobleck_params) is exercised as-is.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
from torch.nn.utils import weight_norm

from ditsep_tpu.models.oobleck import (
    OobleckVAE, decode_audio_chunked, encode_audio_chunked, vae_sample,
)
from ditsep_tpu.models.torch_import import import_oobleck_params

CH, CM, ST, LD = 8, (1, 2), (2, 4), 4  # tiny config; hop = 8


def _torch_residual_unit(ch, dilation):
    pad = (dilation * 6) // 2
    return tnn.Sequential(
        tnn.ELU(),
        weight_norm(tnn.Conv1d(ch, ch, 7, dilation=dilation, padding=pad)),
        tnn.ELU(),
        weight_norm(tnn.Conv1d(ch, ch, 1)),
    )


class _TorchResUnit(tnn.Module):
    def __init__(self, ch, dilation):
        super().__init__()
        self.layers = _torch_residual_unit(ch, dilation)

    def forward(self, x):
        return x + self.layers(x)


class _TorchEncBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.layers = tnn.Sequential(
            _TorchResUnit(cin, 1), _TorchResUnit(cin, 3),
            _TorchResUnit(cin, 9), tnn.ELU(),
            weight_norm(tnn.Conv1d(cin, cout, 2 * stride, stride=stride,
                                   padding=math.ceil(stride / 2))),
        )

    def forward(self, x):
        return self.layers(x)


class _TorchDecBlock(tnn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.layers = tnn.Sequential(
            tnn.ELU(),
            weight_norm(tnn.ConvTranspose1d(
                cin, cout, 2 * stride, stride=stride,
                padding=math.ceil(stride / 2))),
            _TorchResUnit(cout, 1), _TorchResUnit(cout, 3),
            _TorchResUnit(cout, 9),
        )

    def forward(self, x):
        return self.layers(x)


class _TorchOobleck(tnn.Module):
    """Spec-faithful torch Oobleck with the reference Sequential layout."""

    def __init__(self, in_ch=1, channels=CH, c_mults=CM, strides=ST,
                 latent_dim=LD):
        super().__init__()
        cm = (1,) + tuple(c_mults)
        enc = [weight_norm(tnn.Conv1d(in_ch, cm[0] * channels, 7, padding=3))]
        for i, s in enumerate(strides):
            enc.append(_TorchEncBlock(cm[i] * channels, cm[i + 1] * channels,
                                      s))
        enc += [tnn.ELU(),
                weight_norm(tnn.Conv1d(cm[-1] * channels, 2 * latent_dim, 3,
                                       padding=1))]
        self.encoder = tnn.Module()
        self.encoder.layers = tnn.Sequential(*enc)

        dec = [weight_norm(tnn.Conv1d(latent_dim, cm[-1] * channels, 7,
                                      padding=3))]
        for i in range(len(strides), 0, -1):
            dec.append(_TorchDecBlock(cm[i] * channels, cm[i - 1] * channels,
                                      strides[i - 1]))
        dec += [tnn.Identity(),
                weight_norm(tnn.Conv1d(cm[0] * channels, in_ch, 7, padding=3,
                                       bias=False)),
                tnn.Tanh()]
        self.decoder = tnn.Module()
        self.decoder.layers = tnn.Sequential(*dec)

    def encode_mode(self, audio):
        h = self.encoder.layers(audio)
        mean, _ = h.chunk(2, dim=1)
        return mean

    def decode(self, lat):
        return self.decoder.layers(lat)


@pytest.fixture(scope="module")
def parity_pair():
    torch.manual_seed(0)
    tm = _TorchOobleck().eval()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    # strip torch parametrize bookkeeping if present
    state = {k: v for k, v in state.items() if "parametrizations" not in k}

    fm = OobleckVAE(in_channels=1, out_channels=1, channels=CH, c_mults=CM,
                    strides=ST, latent_dim=LD)
    key = jax.random.PRNGKey(0)
    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 256)), jnp.float32)
    variables = fm.init(key, audio)
    params = import_oobleck_params(variables["params"], state,
                                   n_blocks=len(ST))
    return tm, fm, {"params": params}, audio


def test_encoder_parity(parity_pair):
    tm, fm, params, audio = parity_pair
    lat_flax = fm.apply(params, audio, method=fm.encode)
    with torch.no_grad():
        lat_torch = tm.encode_mode(torch.from_numpy(np.asarray(audio)))
    np.testing.assert_allclose(
        np.asarray(lat_flax), lat_torch.numpy(), atol=2e-5)


def test_decoder_parity(parity_pair):
    tm, fm, params, audio = parity_pair
    lat = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, LD, 32)), jnp.float32)
    dec_flax = fm.apply(params, lat, method=fm.decode)
    with torch.no_grad():
        dec_torch = tm.decode(torch.from_numpy(np.asarray(lat)))
    assert dec_flax.shape == tuple(dec_torch.shape)
    np.testing.assert_allclose(
        np.asarray(dec_flax), dec_torch.numpy(), atol=2e-5)


def test_roundtrip_shapes_and_kl(parity_pair):
    _, fm, params, audio = parity_pair
    dec, info = fm.apply(params, audio, key=jax.random.PRNGKey(1))
    assert dec.shape == audio.shape
    assert info["latents"].shape == (2, LD, 256 // 8)
    assert float(info["kl"]) > 0.0


def test_vae_sample_statistics():
    key = jax.random.PRNGKey(0)
    mean = jnp.ones((1, 1000, 4)) * 2.0
    scale = jnp.zeros((1, 1000, 4))  # softplus(0)+1e-4 ~ 0.6932
    lat, kl = vae_sample(key, mean, scale)
    assert abs(float(jnp.mean(lat)) - 2.0) < 0.05
    assert abs(float(jnp.std(lat)) - (math.log(2.0) + 1e-4)) < 0.05
    assert np.isfinite(float(kl))


def test_chunked_encode_decode_stitching(parity_pair):
    """The stitch must paste each chunk's trimmed interior at the right
    offset (reference: autoencoders.py:596-731). Chunked != full encoding
    away from that (receptive-field truncation) -- also true of the
    reference -- so we verify the paste against direct per-chunk encodes."""
    _, fm, params, _ = parity_pair
    rng = np.random.default_rng(2)
    hop = 8
    audio = jnp.asarray(rng.standard_normal((1, 1, hop * 64)), jnp.float32)
    cs, ov = 16, 8
    full = fm.apply(params, audio, method=fm.encode)
    chunked = np.asarray(
        encode_audio_chunked(fm, params, audio, overlap=ov, chunk_size=cs))
    assert chunked.shape == full.shape
    # first chunk: its left (chunk minus trimmed right edge) is pasted as-is
    lat0 = np.asarray(
        fm.apply(params, audio[:, :, :cs * hop], method=fm.encode))
    np.testing.assert_allclose(chunked[:, :, :cs - ov // 2],
                               lat0[:, :, :cs - ov // 2], atol=1e-6)
    # last chunk: right part pasted at the end
    lat_last = np.asarray(
        fm.apply(params, audio[:, :, -cs * hop:], method=fm.encode))
    np.testing.assert_allclose(chunked[:, :, -(cs - ov // 2):],
                               lat_last[:, :, ov // 2:], atol=1e-6)

    dec_full = fm.apply(params, full, method=fm.decode)
    dec_chunked = np.asarray(
        decode_audio_chunked(fm, params, full, overlap=ov, chunk_size=cs))
    assert dec_chunked.shape == dec_full.shape
    dec0 = np.asarray(
        fm.apply(params, full[:, :, :cs], method=fm.decode))
    np.testing.assert_allclose(
        dec_chunked[:, :, :(cs - ov // 2) * hop],
        dec0[:, :, :(cs - ov // 2) * hop], atol=1e-6)


def test_nearest_upsample_exact_length():
    """use_nearest_upsample must keep the exact T*stride output-length
    contract (torch padding='same' on the even 2s kernel is asymmetric:
    s-1 left / s right; symmetric padding lost one frame per block)."""
    from ditsep_tpu.models.oobleck import DecoderBlock

    for s in (2, 4, 8):
        blk = DecoderBlock(out_ch=4, stride=s, use_nearest_upsample=True)
        x = jnp.zeros((1, 10, 8))
        p = blk.init(jax.random.PRNGKey(0), x)
        assert blk.apply(p, x).shape == (1, 10 * s, 4), s


def test_fresh_init_trainable_no_tanh_saturation():
    """Fresh-init health: conv init must use the torch default gain
    (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))). With he_uniform
    (6x the variance) the gain compounded through the ~24-conv snake
    decoder into 99% |tanh|=1 saturation at init -> exactly-zero
    gradients, untrainable from scratch (the round-4 latent long-train
    collapse). Guard both the saturation symptom and the init bound."""
    vae = OobleckVAE(in_channels=1, out_channels=1, channels=32,
                     c_mults=(1, 2, 4), strides=(2, 4, 8), latent_dim=16,
                     use_snake=True)
    key = jax.random.PRNGKey(0)
    audio = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 1, 4096)).astype(np.float32) * 0.2)
    params = vae.init(key, audio)
    lat = vae.apply(params, audio, method=vae.encode)
    dec = np.asarray(vae.apply(params, lat, method=vae.decode))
    assert np.isfinite(dec).all()
    assert (np.abs(dec) > 0.9999).mean() < 0.01
    # conv direction init bound matches torch: |v| <= sqrt(1/fan_in)
    v = params["params"]["decoder"]["block_0"]["res_0"]["conv_0"]["v"]
    fan_in = v.shape[0] * v.shape[1]
    assert float(jnp.abs(v).max()) <= (1.0 / fan_in) ** 0.5 + 1e-6
