"""Interface backend tests (the functional core of the gradio UI,
reference: src/stable_audio_tools/interface/gradio.py:30-425)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_separation_app(tmp_path):
    from ditsep_tpu.interface import SeparationApp
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    tr = DiffSepTrainer(
        model=ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1),
                               attn_resolutions=(), image_size=256),
        sde=MixSDE(), cfg=DiffSepConfig(init_hack=0))
    mix = jax.random.normal(KEY, (1, 1, 2000))
    params = tr.model.init(KEY, jnp.zeros((1, 2, 2000)),
                           jnp.full((1,), 0.5), mix)
    app = SeparationApp(trainer=tr, params=params)
    # stereo (T, C) input like gradio delivers
    wav = np.random.default_rng(0).standard_normal((2000, 2)) * 0.3
    est = app.process(wav.astype(np.float32), n_steps=2)
    assert est.shape == (2, 2000)
    assert np.isfinite(est).all() and np.abs(est).max() <= 1.0 + 1e-6


def test_autoencoder_app():
    from ditsep_tpu.interface import AutoencoderApp
    from ditsep_tpu.models.oobleck import OobleckVAE

    vae = OobleckVAE(channels=8, c_mults=(1, 2), strides=(2, 4),
                     latent_dim=4)
    x = jax.random.normal(KEY, (1, 1, 1600))
    params = vae.init(KEY, x)
    app = AutoencoderApp(vae=vae, params=params)
    rec = app.process(np.asarray(x[0, 0]))
    assert rec.ndim == 1 and np.isfinite(rec).all()
    # latent-noise knob changes the output
    rec2 = app.process(np.asarray(x[0, 0]), latent_noise=0.5)
    assert np.abs(rec - rec2).max() > 1e-6


def test_generation_app_uncond():
    from ditsep_tpu.interface import GenerationApp
    from ditsep_tpu.models.dit import DiffusionTransformer

    dit = DiffusionTransformer(io_channels=2, embed_dim=32, depth=1,
                               num_heads=2)
    x = jax.random.normal(KEY, (1, 2, 64))
    params = dit.init(KEY, x, jnp.full((1,), 0.5))
    app = GenerationApp(model=dit, params=params, io_channels=2,
                        sample_size=64)
    audio = app.generate_uncond(steps=3, seed=1)
    assert audio.shape == (1, 2, 64)
    assert np.isfinite(audio).all()


def test_lm_app_returns_codes_without_decoder():
    from ditsep_tpu.interface import LMApp
    from ditsep_tpu.models.lm import AudioLM

    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=1,
                 num_heads=2)
    tokens = jax.random.randint(KEY, (1, 2, 4), 0, 16)
    params = lm.init(KEY, tokens)
    app = LMApp(lm=lm, lm_params=params)
    codes = app.process(length=4, top_k=4)
    assert codes.shape == (1, 2, 4)
    assert codes.min() >= 0 and codes.max() < 16


def test_create_ui_gated_without_gradio():
    import importlib
    from ditsep_tpu.interface import create_ui
    if importlib.util.find_spec("gradio") is None:
        with pytest.raises(ImportError, match="gradio"):
            create_ui()
