"""Generative-stack tests: LM, k-sampler, generation, FACodec,
pretransforms, extra discriminators and losses."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------------------------- LM ---
def test_delay_pattern_roundtrip():
    from ditsep_tpu.models.lm import DelayPattern
    pat = DelayPattern(n_q=4, special_token=99)
    tokens = jax.random.randint(KEY, (2, 4, 7), 0, 99)
    d = pat.apply(tokens)
    assert d.shape == (2, 4, 10)
    assert jnp.array_equal(pat.revert(d), tokens)
    # codebook q is delayed by q steps
    assert int(d[0, 3, 0]) == 99 and int(d[0, 0, 0]) == int(tokens[0, 0, 0])


def test_lm_loss_init_near_uniform_and_generate():
    from ditsep_tpu.models.lm import AudioLM, lm_generate, lm_loss
    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=1,
                 num_heads=2)
    tokens = jax.random.randint(KEY, (1, 2, 8), 0, 16)
    params = lm.init(KEY, tokens)
    loss = float(lm_loss(lm, params, tokens))
    assert abs(loss - math.log(16)) < 0.3
    gen = lm_generate(lm, params, KEY, batch=1, length=4)
    assert gen.shape == (1, 2, 4)
    assert int(gen.min()) >= 0 and int(gen.max()) < 16


# ------------------------------------------------------------- sample_k ---
def test_sample_k_converges():
    from ditsep_tpu.inference import sample_k
    c = 0.8

    def v_model(x, t, **kw):
        alpha = jnp.cos(t * math.pi / 2).reshape(-1, 1, 1)
        sigma = jnp.sin(t * math.pi / 2).reshape(-1, 1, 1)
        eps = (x - alpha * c) / jnp.maximum(sigma, 1e-6)
        return alpha * eps - sigma * c

    noise = jax.random.normal(KEY, (2, 3, 16))
    out = sample_k(v_model, noise, steps=40, sigma_min=0.02, sigma_max=20.0)
    assert float(jnp.abs(out - c).max()) < 1e-3


def test_generate_diffusion_cond_shapes():
    from ditsep_tpu.inference import generate_diffusion_cond
    from ditsep_tpu.models.dit import DiffusionTransformer
    from ditsep_tpu.models.pretransforms import PatchedPretransform
    dit = DiffusionTransformer(io_channels=4, embed_dim=32, depth=1,
                               num_heads=2, cond_token_dim=8)
    cond = jax.random.normal(KEY, (1, 2, 8))
    p = dit.init(KEY, jnp.zeros((1, 4, 16)), jnp.ones((1,)),
                 cross_attn_cond=cond)
    apply = lambda x, t, **kw: dit.apply(p, x, t, **kw)
    pt = PatchedPretransform(channels=1, patch_size=4)
    out = generate_diffusion_cond(
        apply, KEY, steps=4, cfg_scale=2.0, sample_size=64, io_channels=4,
        cond_inputs={"cross_attn_cond": cond}, pretransform=pt)
    assert out.shape == (1, 1, 64)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------------ facodec -----
def test_facodec_roundtrip_and_vq():
    from ditsep_tpu.models.facodec import (
        FACodecDecoder, FACodecEncoder, gradient_reversal)
    enc = FACodecEncoder(ngf=8, up_ratios=(2, 4), out_channels=16)
    x = jax.random.normal(KEY, (1, 1, 256)) * 0.3
    pe = enc.init(KEY, x)
    h = enc.apply(pe, x)
    assert h.shape == (1, 16, 32)
    dec = FACodecDecoder(in_channels=16, ngf=8, up_ratios=(4, 2),
                         num_quantizers=2, codebook_size=32)
    pd = dec.init(KEY, h, return_info=True)
    audio, info = dec.apply(pd, h, return_info=True)
    assert audio.shape == x.shape
    assert float(info["vq_loss"]) > 0
    assert info["indices"].shape == (1, 32, 2)
    g = jax.grad(lambda z: jnp.sum(gradient_reversal(z, 3.0) * 2.0))(
        jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(g), -6.0)


# -------------------------------------------------------- pretransforms ---
def test_wavelet_perfect_reconstruction():
    from ditsep_tpu.models.pretransforms import WaveletPretransform
    pt = WaveletPretransform(channels=2, levels=3)
    x = jax.random.normal(KEY, (1, 2, 512))
    z = pt.encode(x)
    assert z.shape == (1, 16, 64)
    np.testing.assert_allclose(np.asarray(pt.decode(z)), np.asarray(x),
                               atol=1e-5)


def test_pqmf_near_perfect_reconstruction():
    from ditsep_tpu.models.pretransforms import PQMFPretransform
    pt = PQMFPretransform(bands=4, taps=64)
    x = jax.random.normal(KEY, (1, 1, 1024))
    z = pt.encode(x)
    assert z.shape == (1, 4, 256)
    back = np.asarray(pt.decode(z)).reshape(-1)
    a = np.asarray(x).reshape(-1)
    n = min(len(a), len(back))
    corr = np.corrcoef(a[:n], back[:n])[0, 1]
    assert corr > 0.98


# -------------------------------------------------- extra discriminators --
def test_oobleck_and_period_discriminators():
    from ditsep_tpu.models.discriminators import (
        MultiPeriodDiscriminator, OobleckDiscriminator)
    x = jax.random.normal(KEY, (2, 1, 512)) * 0.3
    od = OobleckDiscriminator(n_scales=2, capacity=4)
    p = od.init(KEY, x)
    logits, fmaps = od.apply(p, x)
    assert np.isfinite(np.asarray(logits[0])).all()
    mpd = MultiPeriodDiscriminator(periods=(2, 3), capacity=4, n_layers=2)
    p2 = mpd.init(KEY, x)
    logits2, fmaps2 = mpd.apply(p2, x)
    assert len(logits2) == 2 and len(fmaps2[0]) == 2


# ------------------------------------------------------------ losses ------
def test_mel_and_sumdiff_losses():
    from ditsep_tpu.training.auraloss import (
        mel_stft_loss, sum_and_difference_stft_loss)
    x = jax.random.normal(KEY, (1, 1, 2048)) * 0.3
    y = x + 0.1 * jax.random.normal(jax.random.PRNGKey(1), x.shape)
    l_same = float(mel_stft_loss(x, x, fft_size=512, hop_size=128))
    l_diff = float(mel_stft_loss(x, y, fft_size=512, hop_size=128))
    assert l_same < 1e-6 < l_diff
    st = jnp.concatenate([x, y], axis=1)
    v = float(sum_and_difference_stft_loss(
        st, st, fft_sizes=(256,), hop_sizes=(64,)))
    assert v < 1e-6


# ------------------------------------------------------- factory/json -----
def test_factory_parses_reference_config():
    from ditsep_tpu.models.factory import create_model_from_config_path
    vae = create_model_from_config_path(
        "/root/reference/src/stable_audio_tools/configs/model_configs/"
        "autoencoders/oobleck_finetune.json")
    assert vae.latent_dim == 64
    assert vae.downsampling_ratio == 2048
