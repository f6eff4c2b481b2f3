"""Latent pipeline tests: LatentDiffSep, VAE-GAN trainer, LDM decoder
finetune, spectral losses, discriminator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.models import LatentScoreModelNCSNpp
from ditsep_tpu.models.discriminators import (
    MultiScaleSTFTDiscriminator, encodec_discriminator_loss,
)
from ditsep_tpu.models.oobleck import OobleckVAE
from ditsep_tpu.sdes import OUVESDE
from ditsep_tpu.training import (
    AutoencoderTrainer, DiffSepConfig, LatentDiffSepTrainer, LDMTrainer,
    inverse_lr_schedule,
)
from ditsep_tpu.training import auraloss


# tiny VAE: hop 8, latent 4
# heavyweight end-to-end tests: deselect with -m 'not slow' for quick
# iteration (the full suite still runs them)
pytestmark = pytest.mark.slow

def _vae():
    return OobleckVAE(channels=8, c_mults=(1, 2), strides=(2, 4),
                      latent_dim=4)


def _latent_trainer():
    model = LatentScoreModelNCSNpp(
        num_sources=2, nf=16, ch_mult=(1, 2), attn_resolutions=(),
        image_size=4, max_latent_length=4)
    sde = OUVESDE(theta=1.5, sigma_min=0.96, sigma_max=10.0, N=30)
    return LatentDiffSepTrainer(
        model=model, sde=sde, vae=_vae(),
        cfg=DiffSepConfig(init_hack=5, lr=1e-3))


@pytest.fixture(scope="module")
def latent_setup():
    tr = _latent_trainer()
    key = jax.random.PRNGKey(0)
    mix = jax.random.normal(key, (2, 1, 512))
    tgt = jax.random.normal(key, (2, 2, 512)) * 0.5
    vae_params = tr.vae.init(key, mix)
    mix_lat, tgt_lat = tr.encode(vae_params, key, mix, tgt)
    params = tr.model.init(key, tgt_lat, jnp.full((2,), 0.5), mix_lat)
    return tr, params, vae_params, mix, tgt


def test_latent_encode_shapes(latent_setup):
    tr, params, vae_params, mix, tgt = latent_setup
    mix_lat, tgt_lat = tr.encode(vae_params, jax.random.PRNGKey(1), mix, tgt)
    assert mix_lat.shape == (2, 1, 4, 64)
    assert tgt_lat.shape == (2, 2, 4, 64)


def test_latent_train_step(latent_setup):
    tr, params, vae_params, mix, tgt = latent_setup
    state = tr.init_state(params)
    step = jax.jit(lambda s, k, b: tr.train_step_latent(s, vae_params, k, b))
    losses = []
    for i in range(3):
        state, m = step(state, jax.random.PRNGKey(i), (mix, tgt))
        losses.append(float(m["train/score_loss"]))
    assert all(np.isfinite(losses))
    assert int(state.step) == 3


def test_latent_separate(latent_setup):
    tr, params, vae_params, mix, tgt = latent_setup
    est, nfe = tr.separate_latent(params, vae_params, jax.random.PRNGKey(0),
                                  mix, target_dim=tgt.shape[-1], N=3)
    assert est.shape == tgt.shape
    assert nfe == 6
    m = tr.val_metrics_latent(params, vae_params, jax.random.PRNGKey(1),
                              (mix, tgt), N=2)
    assert np.isfinite(float(m["val/si_sdr"]))


# ------------------------------------------------------------ auraloss ----
def test_mrstft_zero_at_identity():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 2048))
    v = auraloss.multi_resolution_stft_loss(
        x, x, fft_sizes=(512, 256), hop_sizes=(128, 64))
    assert float(v) < 1e-5


def test_mrstft_positive_and_ordered():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 1, 2048))
    small = x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    big = x + 0.5 * jax.random.normal(jax.random.PRNGKey(3), x.shape)
    args = dict(fft_sizes=(512, 256), hop_sizes=(128, 64))
    l_small = float(auraloss.multi_resolution_stft_loss(small, x, **args))
    l_big = float(auraloss.multi_resolution_stft_loss(big, x, **args))
    assert 0 < l_small < l_big


def test_pit_min_picks_best_permutation():
    ref = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 1024))
    est_swapped = ref[:, ::-1, :]
    direct = float(auraloss.pit_min(auraloss.l1_loss, ref, ref))
    swapped = float(auraloss.pit_min(auraloss.l1_loss, est_swapped, ref))
    assert direct < 1e-7 and swapped < 1e-7


def test_a_weighting_filter_shape():
    taps = auraloss.a_weighting_fir(8000)
    assert taps.shape == (101,)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 500))
    y = auraloss.fir_prefilter(x, taps)
    assert y.shape == x.shape


# ------------------------------------------------------- discriminator ----
@pytest.fixture(scope="module")
def tiny_disc():
    disc = MultiScaleSTFTDiscriminator(filters=4, n_ffts=(128, 64),
                                       hop_lengths=(32, 16))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 1, 1024))
    params = disc.init(jax.random.PRNGKey(1), x)
    return disc, params, x


def test_discriminator_outputs(tiny_disc):
    disc, params, x = tiny_disc
    logits, fmaps = disc.apply(params, x)
    assert len(logits) == 2 and len(fmaps) == 2
    assert all(np.isfinite(np.asarray(l)).all() for l in logits)
    assert len(fmaps[0]) == 5  # first conv + 3 dilated + pre-post conv


def test_discriminator_loss_terms(tiny_disc):
    disc, params, x = tiny_disc
    fakes = x + 0.5 * jax.random.normal(jax.random.PRNGKey(2), x.shape)
    dis, adv, fm = encodec_discriminator_loss(disc, params, x, fakes)
    assert np.isfinite(float(dis)) and np.isfinite(float(adv))
    assert float(fm) > 0


# ------------------------------------------------------- VAE-GAN / LDM ----
def test_autoencoder_gan_training():
    vae = _vae()
    disc = MultiScaleSTFTDiscriminator(filters=4, n_ffts=(128,),
                                       hop_lengths=(32,))
    tr = AutoencoderTrainer(
        vae=vae, disc=disc, lr=1e-3,
        loss_cfg=__import__(
            "ditsep_tpu.training.autoencoder",
            fromlist=["AutoencoderLossConfig"]).AutoencoderLossConfig(
            fft_sizes=(256, 128), hop_sizes=(64, 32),
            perceptual_weighting=False))
    key = jax.random.PRNGKey(0)
    reals = jax.random.normal(key, (2, 1, 1024)) * 0.3
    vae_params = vae.init(key, reals)
    disc_params = disc.init(key, reals)
    state = tr.init_state(vae_params, disc_params)

    gen = jax.jit(lambda s, k, r: tr.gen_step(s, k, r, warmed_up=True))
    dsc = jax.jit(tr.disc_step)
    for i in range(4):
        k = jax.random.PRNGKey(i)
        if tr.use_disc_this_step(i):
            state, m = dsc(state, k, reals)
            assert np.isfinite(float(m["train/discriminator_loss"]))
        else:
            state, m = gen(state, k, reals)
            assert np.isfinite(float(m["train/loss"]))
    assert int(state.step) == 4


def test_ldm_decoder_finetune_decreases_loss():
    tr_lat = _latent_trainer()
    key = jax.random.PRNGKey(0)
    reals = jax.random.normal(key, (1, 2, 512)) * 0.3
    vae_params = tr_lat.vae.init(key, reals[:, :1])
    from ditsep_tpu.training.ldm import LDMLossWeights
    ldm = LDMTrainer(
        latent_trainer=tr_lat, disc=None, lr=1e-3,
        weights=LDMLossWeights(fft_sizes=(256, 128), hop_sizes=(64, 32),
                               perceptual_weighting=False, l1=1.0))
    frozen_rest, dec = ldm.split_vae_params(vae_params)
    state = ldm.init_state(vae_params)
    # latents from encoding the targets (stand-in for cached sampler output)
    _, tgt_lat = tr_lat.encode(vae_params, None, reals[:, :1], reals)
    step = jax.jit(
        lambda s, l, r: ldm.gen_step(s, frozen_rest, l, r, warmed_up=False))
    losses = []
    for i in range(5):
        state, m = step(state, tgt_lat, reals)
        losses.append(float(m["train/loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_inverse_lr_schedule():
    s = inverse_lr_schedule(1e-3, inv_gamma=100, power=0.5, warmup=0.9)
    v0, v10, v1000 = float(s(0)), float(s(10)), float(s(1000))
    assert v0 < v10  # warmup rising
    assert v1000 < 1e-3  # decay below base


def test_ldm_gan_steps_with_discriminator(latent_setup):
    """The adversarial finetune path end to end: disc initialized on the
    (B, n_src, T) stacks the losses actually see (this crashed when the
    CLI built disc params for one channel), gen step with adversarial +
    feature-matching terms, disc step, GAN alternation."""
    from ditsep_tpu.training.ldm import LDMLossWeights

    tr_lat, params, vae_params, mix, tgt = latent_setup
    reals = tgt
    disc = MultiScaleSTFTDiscriminator(filters=4, n_ffts=(64,),
                                       hop_lengths=(16,))
    disc_params = disc.init(jax.random.PRNGKey(3), reals)
    ldm = LDMTrainer(
        latent_trainer=tr_lat, disc=disc, lr=1e-3,
        weights=LDMLossWeights(fft_sizes=(256, 128), hop_sizes=(64, 32),
                               perceptual_weighting=False, l1=1.0,
                               adversarial=0.1, feature_matching=1.0))
    frozen_rest, _ = ldm.split_vae_params(vae_params)
    state = ldm.init_state(vae_params, disc_params)
    _, tgt_lat = tr_lat.encode(vae_params, None, reals[:, :1], reals)

    gen = jax.jit(ldm.gen_step, static_argnames=("warmed_up",))
    state, m = gen(state, frozen_rest, tgt_lat, reals, warmed_up=True)
    assert np.isfinite(float(m["train/loss"]))
    assert "train/loss_adv" in m and "train/feature_matching_loss" in m

    dsc = jax.jit(ldm.disc_step)
    state, md = dsc(state, frozen_rest, tgt_lat, reals)
    assert np.isfinite(float(md["train/discriminator_loss"]))
    assert not ldm.use_disc_this_step(0)


def test_latent_pit_loss_rank_generic(latent_setup):
    """compute_score_loss_with_pit on the 5-D latent state (B, n_src, D,
    Tl): the permutation select must be rank-generic (crashed with
    hardcoded 4-D indices)."""
    import dataclasses as _dc

    tr_lat, params, vae_params, mix, tgt = latent_setup
    tr6 = _dc.replace(tr_lat, cfg=_dc.replace(tr_lat.cfg, init_hack=6))
    loss = tr6.training_loss_latent(params, vae_params,
                                    jax.random.PRNGKey(5), mix, tgt)
    assert np.isfinite(float(loss))
