"""Codec encoder/decoder zoo: DAC / SEANet / TAAE / local-attn types and
the generic autoencoder composition (reference:
src/stable_audio_tools/models/autoencoders.py:782-905)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_factory_parses_shipped_dac_and_seanet_configs():
    """The reference's own autoencoder JSONs (dac encoder/decoder pair,
    seanet + rvq) build module objects through the factory."""
    from ditsep_tpu.models.codecs import GenericAudioAutoencoder
    from ditsep_tpu.models.factory import create_autoencoder_from_config

    base = ("/root/reference/src/stable_audio_tools/configs/model_configs/"
            "autoencoders/")
    try:
        dac_cfg = json.load(open(base + "dac_2048_32_vae.json"))
        sea_cfg = json.load(open(base + "encodec_musicgen_rvq.json"))
    except OSError:
        pytest.skip("reference configs not available")

    dac = create_autoencoder_from_config(dac_cfg)
    assert isinstance(dac, GenericAudioAutoencoder)
    assert dac.bottleneck_type == "vae"
    assert dac.encoder.hop_length == 4 * 8 * 8 * 8

    sea = create_autoencoder_from_config(sea_cfg)
    assert isinstance(sea, GenericAudioAutoencoder)
    assert sea.bottleneck_type == "rvq"
    assert sea.encoder.hop_length == 4 * 4 * 5 * 8


def test_dac_autoencoder_roundtrip():
    from ditsep_tpu.models.codecs import (
        DACDecoderWrapper, DACEncoderWrapper, GenericAudioAutoencoder)

    ae = GenericAudioAutoencoder(
        encoder=DACEncoderWrapper(d_model=8, strides=(2, 2), latent_dim=8),
        decoder=DACDecoderWrapper(latent_dim=4, channels=16, rates=(2, 2)),
        latent_dim=4, bottleneck_type="vae")
    audio = jax.random.normal(KEY, (2, 1, 32))
    params = ae.init(KEY, audio, key=KEY)
    lat, info = ae.apply(params, audio, key=KEY, return_info=True,
                         method=ae.encode)
    assert lat.shape == (2, 4, 8)  # hop 4, latent_dim 64/2 -> 4 here
    assert np.isfinite(float(info["kl"]))
    out = ae.apply(params, lat, method=ae.decode)
    assert out.shape == audio.shape
    assert float(jnp.abs(out).max()) <= 1.0  # DAC decoder ends in tanh


def test_seanet_autoencoder_roundtrip_with_rvq():
    from ditsep_tpu.models.codecs import (
        GenericAudioAutoencoder, SEANetDecoder, SEANetEncoder)

    enc = SEANetEncoder(channels=1, dimension=8, n_filters=4,
                        ratios=(2, 2), n_residual_layers=1, lstm=1)
    dec = SEANetDecoder(channels=1, dimension=8, n_filters=4,
                        ratios=(2, 2), n_residual_layers=1, lstm=1)
    ae = GenericAudioAutoencoder(
        encoder=enc, decoder=dec, latent_dim=8, bottleneck_type="rvq",
        bottleneck_config={"dim": 8, "codebook_size": 16,
                           "num_quantizers": 2})
    audio = jax.random.normal(KEY, (2, 1, 32))
    params = ae.init(KEY, audio, key=KEY)
    out, info = ae.apply(params, audio, key=KEY)
    assert out.shape == audio.shape
    assert info["latents"].shape == (2, 8, 8)  # hop 4
    assert info["codes"].shape == (2, 8, 2)
    assert np.isfinite(float(info["quantizer_loss"]))


def test_taae_roundtrip():
    from ditsep_tpu.models.codecs import (
        GenericAudioAutoencoder, TAAEDecoder, TAAEEncoder)

    enc = TAAEEncoder(in_channels=1, channels=8, latent_dim=4,
                      c_mults=(1, 2), strides=(2, 2),
                      transformer_depths=(1, 1), sliding_window=(3, 4),
                      conformer=True, layer_scale=True)
    dec = TAAEDecoder(out_channels=1, channels=8, latent_dim=4,
                      c_mults=(1, 2), strides=(2, 2),
                      transformer_depths=(1, 1), sliding_window=(3, 4),
                      conformer=True, layer_scale=True)
    ae = GenericAudioAutoencoder(encoder=enc, decoder=dec, latent_dim=4,
                                 bottleneck_type="tanh")
    audio = jax.random.normal(KEY, (1, 1, 32))
    params = ae.init(KEY, audio, key=KEY)
    lat = ae.apply(params, audio, method=ae.encode)
    assert lat.shape == (1, 4, 8)
    assert float(jnp.abs(lat).max()) <= 1.0  # tanh bottleneck
    out = ae.apply(params, lat, method=ae.decode)
    assert out.shape == audio.shape


def test_local_attn_roundtrip():
    from ditsep_tpu.models.codecs import (
        GenericAudioAutoencoder, LocalTransformerDecoder1D,
        LocalTransformerEncoder1D)

    enc = LocalTransformerEncoder1D(
        in_channels=1, out_channels=4, embed_dims=(8, 16), heads=(2, 2),
        depths=(1, 1), ratios=(2, 2), local_attn_window_size=4)
    dec = LocalTransformerDecoder1D(
        in_channels=4, out_channels=1, embed_dims=(16, 8), heads=(2, 2),
        depths=(1, 1), ratios=(2, 2), local_attn_window_size=4)
    ae = GenericAudioAutoencoder(encoder=enc, decoder=dec, latent_dim=4,
                                 bottleneck_type="l2_norm")
    audio = jax.random.normal(KEY, (1, 1, 16))
    params = ae.init(KEY, audio, key=KEY)
    lat, info = ae.apply(params, audio, key=KEY, return_info=True,
                         method=ae.encode)
    assert lat.shape == (1, 4, 4)  # hop 4
    # l2_norm: unit norm over channels
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(lat), axis=1), 1.0, rtol=1e-4)
    out = ae.apply(params, lat, method=ae.decode)
    assert out.shape == audio.shape
