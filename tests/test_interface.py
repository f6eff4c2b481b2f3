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


def test_generation_app_conditional_variations_and_inpaint():
    """The diffusion_cond tab's full knob set (reference:
    interfaces/diffusion_cond.py): text/number conditioning + CFG,
    audio-prompted variations (init_audio + init_noise_level), and
    inpainting (mask keeps init content where 0)."""
    from ditsep_tpu.interface import GenerationApp
    from ditsep_tpu.models.conditioners import (MultiConditioner,
                                                NumberConditioner)
    from ditsep_tpu.models.dit import DiffusionTransformer
    from ditsep_tpu.training.diffusion import CondRouting
    import jax.numpy as jnp

    mc = MultiConditioner({"secs": NumberConditioner(output_dim=8,
                                                     max_val=10)})
    inputs = {"secs": jnp.array([2.0])}
    cvars = mc.init(KEY, inputs)
    routing = CondRouting(cross_attn_cond_ids=("secs",))
    dit = DiffusionTransformer(io_channels=1, embed_dim=32, depth=1,
                               num_heads=2, cond_token_dim=8)
    cond = mc(cvars, inputs)
    params = dit.init(KEY, jnp.zeros((1, 1, 64)), jnp.full((1,), 0.5),
                      **routing.gather(cond))
    app = GenerationApp(model=dit, params=params, io_channels=1,
                        sample_size=64, routing=routing, conditioner=mc,
                        conditioner_vars=cvars)

    out = app.generate_conditional(inputs, steps=3, cfg_scale=2.0, seed=0)
    assert out.shape == (1, 1, 64) and np.isfinite(out).all()

    init = np.sin(np.linspace(0, 20, 64)).astype(np.float32)
    # low init noise -> variation stays close to the prompt audio
    var = app.generate_conditional(inputs, steps=3, seed=0,
                                   init_audio=init,
                                   init_noise_level=0.05)
    assert var.shape == (1, 1, 64)
    assert np.abs(var[0, 0] - init).max() < np.abs(out[0, 0] - init).max()

    # inpaint: mask=0 on the first half -> init content preserved there
    mask = np.ones(64, np.float32)
    mask[:32] = 0.0
    inp = app.generate_conditional(inputs, steps=3, seed=0,
                                   init_audio=init, init_noise_level=1.0,
                                   inpaint_mask=mask)
    # the backend peak-normalizes prompt audio (gradio input hygiene)
    init_n = init / np.abs(init).max()
    np.testing.assert_allclose(inp[0, 0, :32], init_n[:32], atol=1e-5)
    assert np.abs(inp[0, 0, 32:] - init_n[32:]).max() > 1e-3
