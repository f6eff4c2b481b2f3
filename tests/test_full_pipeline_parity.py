"""Full-pipeline parity oracle: the reference's OWN separation pipeline
(torch, CPU) vs our jitted pipeline, with imported weights and matched
noise, compared at the output-waveform level.

The torch side runs the reference's real components end-to-end --
``utils.separate.normalize_batch`` -> ``sdes.get_pc_sampler(
"reverse_diffusion", "ald2")`` (reference: src/sdes/__init__.py:133-193,
the exact call DiffSepModel.separate / evaluate_mp make,
src/diffsep.py:82-98, src/evaluate_mp.py:311-327) ->
``denormalize_batch`` -- over the reference's real ScoreModelNCSNpp
(src/models/diffsep/score_models.py:10-138) with torchaudio/hydra/CUDA-op
stubbed by faithful CPU equivalents. The JAX side imports the torch
weights via models.torch_import and runs our jitted
``DiffSepTrainer.separate``. Both consume the SAME numpy noise arrays
(prior + per-step corrector/predictor draws), so any drift in
normalize / prior / corrector / predictor / denoise / STFT semantics
fails the waveform comparison.

This is the strongest parity statement available without the shipped
checkpoints or data (egress is blackholed in this image); with real
weights the same machinery validates against results/.../librimix_test
oracles instead.
"""
import importlib
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from test_ncsnpp import REF_SRC, _install_reference

# ------------------------------------------------------------- stubs -----


def _load_module_from_file(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def _install_torchaudio_stub():
    """torchaudio.transforms.{Spectrogram,InverseSpectrogram} on top of
    torch.stft/istft with torchaudio's defaults (win_length=n_fft, hann
    window, normalized=False, onesided=True). Matches the reference's
    stft_args usage (score_models.py:28-30)."""
    if "torchaudio" in sys.modules:
        return
    import importlib.machinery
    ta = types.ModuleType("torchaudio")
    tr = types.ModuleType("torchaudio.transforms")
    # a module in sys.modules with __spec__ None makes
    # importlib.util.find_spec RAISE for anyone probing availability
    # (transformers does at import); a loaderless spec is valid, and
    # transformers still concludes "not installed" because no
    # distribution metadata exists for it
    ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", None)
    tr.__spec__ = importlib.machinery.ModuleSpec(
        "torchaudio.transforms", None)

    class Spectrogram(torch.nn.Module):
        def __init__(self, n_fft, hop_length, center=True,
                     pad_mode="reflect", power=None):
            super().__init__()
            assert power is None, "reference uses complex spectrograms"
            self.n_fft, self.hop = n_fft, hop_length
            self.center, self.pad_mode = center, pad_mode
            self.register_buffer("window", torch.hann_window(n_fft))

        def forward(self, x):
            shape = x.shape
            s = torch.stft(
                x.reshape(-1, shape[-1]), self.n_fft, self.hop, self.n_fft,
                self.window, center=self.center, pad_mode=self.pad_mode,
                normalized=False, onesided=True, return_complex=True)
            return s.reshape(shape[:-1] + s.shape[-2:])

    class InverseSpectrogram(torch.nn.Module):
        def __init__(self, n_fft, hop_length, center=True,
                     pad_mode="reflect"):
            super().__init__()
            self.n_fft, self.hop, self.center = n_fft, hop_length, center
            self.register_buffer("window", torch.hann_window(n_fft))

        def forward(self, spec, length=None):
            shape = spec.shape
            x = torch.istft(
                spec.reshape((-1,) + shape[-2:]), self.n_fft, self.hop,
                self.n_fft, self.window, center=self.center,
                normalized=False, onesided=True, length=length)
            return x.reshape(shape[:-2] + x.shape[-1:])

    tr.Spectrogram = Spectrogram
    tr.InverseSpectrogram = InverseSpectrogram
    ta.transforms = tr
    sys.modules["torchaudio"] = ta
    sys.modules["torchaudio.transforms"] = tr


def _install_hydra_stub():
    """hydra.utils.instantiate for the reference's _target_ dispatch
    (score_models.py:27)."""
    if "hydra" in sys.modules:
        return
    hy = types.ModuleType("hydra")
    hu = types.ModuleType("hydra.utils")

    def instantiate(cfg, **kw):
        cfg = dict(cfg)
        tgt = cfg.pop("_target_")
        cfg.pop("_recursive_", None)
        cfg.update(kw)
        mod, cls = tgt.rsplit(".", 1)
        return getattr(importlib.import_module(mod), cls)(**cfg)

    hu.instantiate = instantiate
    hy.utils = hu
    sys.modules["hydra"] = hy
    sys.modules["hydra.utils"] = hu


def _install_utils_stub():
    """Expose the reference's utils.registry / utils.separate without
    running utils/__init__.py (which pulls pytorch_lightning and
    stable_audio_tools -- absent here)."""
    if "utils" in sys.modules and hasattr(sys.modules["utils"], "separate"):
        return
    pkg = types.ModuleType("utils")
    pkg.__path__ = []
    sys.modules["utils"] = pkg
    reg = _load_module_from_file("utils.registry",
                                 REF_SRC + "/utils/registry.py")
    sep = _load_module_from_file("utils.separate",
                                 REF_SRC + "/utils/separate.py")
    pkg.registry = reg
    pkg.separate = sep


def _reference_modules():
    _install_reference()
    _install_torchaudio_stub()
    _install_hydra_stub()
    _install_utils_stub()
    import sdes as ref_sdes
    from models.diffsep.score_models import ScoreModelNCSNpp as TorchScore
    ref_sep = sys.modules["utils"].separate
    return ref_sdes, TorchScore, ref_sep


# ------------------------------------------------------------ the test ---

N_STEPS = 3
SNR = 0.5
T_EPS = 0.03
T_LEN = 4000
MODEL_KW = dict(nf=16, ch_mult=(1, 1, 2), num_res_blocks=2,
                attn_resolutions=(64,), image_size=256)


@pytest.mark.slow
def test_full_separation_pipeline_matches_reference():
    ref_sdes, TorchScore, ref_sep = _reference_modules()

    # --- torch reference model (random init, fixed seed) ---
    torch.manual_seed(0)
    tm = TorchScore(
        num_sources=2,
        stft_args={"n_fft": 510, "hop_length": 128, "center": True,
                   "pad_mode": "constant"},
        backbone_args={"_target_": "models.diffsep.ncsnpp.NCSNpp",
                       **{k: list(v) if isinstance(v, tuple) else v
                          for k, v in MODEL_KW.items()}},
        transform="exponent", spec_abs_exponent=0.5, spec_factor=0.15)
    tm.eval()
    t_sde = ref_sdes.sdes.MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05,
                                 sigma_max=0.5, N=N_STEPS)

    # --- shared inputs + noise (the entire stochastic budget) ---
    rng = np.random.default_rng(7)
    mix_np = (rng.standard_normal((1, 1, T_LEN)) * 0.1).astype(np.float32)
    prior_z = rng.standard_normal((1, 2, T_LEN)).astype(np.float32)
    corr_z = rng.standard_normal((N_STEPS, 1, 1, 2, T_LEN)).astype(
        np.float32)
    pred_z = rng.standard_normal((N_STEPS, 1, 2, T_LEN)).astype(np.float32)

    # --- torch pipeline: normalize -> PC sample -> denormalize ---
    queue = [prior_z]
    for i in range(N_STEPS):
        queue.append(corr_z[i, 0])
        queue.append(pred_z[i])
    orig_randn_like = torch.randn_like

    def fake_randn_like(x, *a, **k):
        z = torch.from_numpy(queue.pop(0)).to(x.dtype)
        assert z.shape == x.shape, (z.shape, x.shape)
        return z

    mix_t = torch.from_numpy(mix_np)
    (mix_n, _), mean, std = ref_sep.normalize_batch((mix_t, None))
    sampler = ref_sdes.get_pc_sampler(
        "reverse_diffusion", "ald2", sde=t_sde, score_fn=tm, y=mix_n,
        denoise=True, eps=T_EPS, snr=SNR, corrector_steps=1)
    torch.randn_like = fake_randn_like
    try:
        with torch.no_grad():
            est_t, ns = sampler()
    finally:
        torch.randn_like = orig_randn_like
    assert not queue, f"{len(queue)} unconsumed noise draws"
    assert ns == N_STEPS * 2
    est_t = ref_sep.denormalize_batch(est_t, mean, std).numpy()

    # --- our pipeline: import weights, jit trainer.separate ---
    from ditsep_tpu.models import import_params
    from ditsep_tpu.models.score_models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    fm = ScoreModelNCSNpp(num_sources=2, n_fft=510, hop_length=128,
                          transform="exponent", spec_abs_exponent=0.5,
                          spec_factor=0.15, **MODEL_KW)
    key = jax.random.PRNGKey(0)
    xt0 = jnp.zeros((1, 2, T_LEN))
    t0 = jnp.full((1,), 0.5)
    variables = fm.init(key, xt0, t0, jnp.asarray(mix_np))
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": import_params(variables["params"], state)}

    trainer = DiffSepTrainer(
        model=fm, sde=MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05,
                             sigma_max=0.5, N=N_STEPS),
        cfg=DiffSepConfig(n_speakers=2, t_eps=T_EPS))
    noise = (prior_z, corr_z, pred_z)
    sep_jit = jax.jit(lambda p, k, m: trainer.separate(
        p, k, m, N=N_STEPS, snr=SNR, corrector_steps=1, noise=noise)[0])
    est_j = np.asarray(sep_jit(params, key, jnp.asarray(mix_np)))

    # --- waveform-level agreement ---
    scale = max(np.max(np.abs(est_t)), 1e-6)
    rel = np.max(np.abs(est_j - est_t)) / scale
    assert rel < 1e-3, f"waveform relative error {rel}"


@pytest.mark.slow
def test_full_separation_pipeline_matches_reference_ouve():
    """The DiffSepOU family (the 14.408 OUVE checkpoint's path):
    normalize -> get_pc_sampler("reverse_diffusion", "ald") ->
    denormalize (reference: src/diffsep.py:1204-1219, non-EDM forward
    :830 = plain score_model call). OUVESDE.prior_sampling draws with
    ``torch.randn`` (sdes.py:683-691) and the 'ald' corrector with
    ``randn_like`` (correctors.py:58-84), so both are patched."""
    ref_sdes, TorchScore, ref_sep = _reference_modules()

    torch.manual_seed(0)
    tm = TorchScore(
        num_sources=2,
        stft_args={"n_fft": 510, "hop_length": 128, "center": True,
                   "pad_mode": "constant"},
        backbone_args={"_target_": "models.diffsep.ncsnpp.NCSNpp",
                       **{k: list(v) if isinstance(v, tuple) else v
                          for k, v in MODEL_KW.items()}},
        transform="exponent", spec_abs_exponent=0.5, spec_factor=0.15)
    tm.eval()
    t_sde = ref_sdes.sdes.OUVESDE(theta=1.5, sigma_min=0.05,
                                  sigma_max=0.5, N=N_STEPS)

    rng = np.random.default_rng(11)
    mix_np = (rng.standard_normal((1, 1, T_LEN)) * 0.1).astype(np.float32)
    prior_z = rng.standard_normal((1, 2, T_LEN)).astype(np.float32)
    corr_z = rng.standard_normal((N_STEPS, 1, 1, 2, T_LEN)).astype(
        np.float32)
    pred_z = rng.standard_normal((N_STEPS, 1, 2, T_LEN)).astype(np.float32)

    queue = [prior_z]
    for i in range(N_STEPS):
        queue.append(corr_z[i, 0])
        queue.append(pred_z[i])

    def pop(shape, dtype):
        z = torch.from_numpy(queue.pop(0)).to(dtype)
        assert z.shape == torch.Size(shape), (z.shape, shape)
        return z

    orig_randn_like, orig_randn = torch.randn_like, torch.randn

    mix_t = torch.from_numpy(mix_np)
    (mix_n, _), mean, std = ref_sep.normalize_batch((mix_t, None))
    sampler = ref_sdes.get_pc_sampler(
        "reverse_diffusion", "ald", sde=t_sde, score_fn=tm, y=mix_n,
        denoise=True, eps=T_EPS, snr=SNR, corrector_steps=1)
    torch.randn_like = lambda x, *a, **k: pop(x.shape, x.dtype)
    torch.randn = lambda shape, *a, **k: pop(shape, torch.float32)
    try:
        with torch.no_grad():
            est_t, ns = sampler()
    finally:
        torch.randn_like, torch.randn = orig_randn_like, orig_randn
    assert not queue, f"{len(queue)} unconsumed noise draws"
    assert ns == N_STEPS * 2
    est_t = ref_sep.denormalize_batch(est_t, mean, std).numpy()

    from ditsep_tpu.models import import_params
    from ditsep_tpu.models.score_models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import OUVESDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    fm = ScoreModelNCSNpp(num_sources=2, n_fft=510, hop_length=128,
                          transform="exponent", spec_abs_exponent=0.5,
                          spec_factor=0.15, **MODEL_KW)
    key = jax.random.PRNGKey(0)
    variables = fm.init(key, jnp.zeros((1, 2, T_LEN)), jnp.full((1,), 0.5),
                        jnp.asarray(mix_np))
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": import_params(variables["params"], state)}

    trainer = DiffSepTrainer(
        model=fm, sde=OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5,
                              N=N_STEPS),
        cfg=DiffSepConfig(n_speakers=2, t_eps=T_EPS))
    noise = (prior_z, corr_z, pred_z)
    sep_jit = jax.jit(lambda p, k, m: trainer.separate(
        p, k, m, N=N_STEPS, snr=SNR, corrector_steps=1, noise=noise)[0])
    est_j = np.asarray(sep_jit(params, key, jnp.asarray(mix_np)))

    scale = max(np.max(np.abs(est_t)), 1e-6)
    rel = np.max(np.abs(est_j - est_t)) / scale
    assert rel < 1e-3, f"waveform relative error {rel}"


@pytest.mark.slow
def test_full_latent_separation_pipeline_matches_reference():
    """The latent (thesis) pipeline: VAE-encode -> get_pc_sampler(
    "reverse_diffusion", "ald") in latent space -> VAE-decode, the exact
    composition of LatentDiffSep.separate (reference:
    src/diffsep_latent.py:107-128 encode/decode, :471-487 separate).

    Torch side: the spec-faithful _TorchOobleck oracle from
    test_oobleck (itself parity-tested against our OobleckVAE via the
    production importer) with VAEBottleneck sampling semantics
    (reference: src/stable_audio_tools/models/bottleneck.py:71-83), the
    reference's REAL LatentScoreModelNCSNpp + NCSNpp
    (src/models/diffsep/score_models.py:140-186), the reference's REAL
    utils.pad (src/utils/torch_utils.py:12-18) and REAL
    sdes.get_pc_sampler/OUVESDE. JAX side: our jitted
    LatentDiffSepTrainer.separate_latent with weights imported through
    the production importers. Both consume the SAME posterior / prior /
    corrector / predictor noise arrays, so drift anywhere in
    pad -> encode -> prior -> ald -> reverse_diffusion -> denoise ->
    decode fails the waveform comparison."""
    ref_sdes, _, _ = _reference_modules()
    from models.diffsep.score_models import LatentScoreModelNCSNpp as TLSM
    tu = _load_module_from_file("utils.torch_utils",
                                REF_SRC + "/utils/torch_utils.py")

    from test_oobleck import CH, CM, LD, ST, _TorchOobleck

    hop = 1
    for s in ST:
        hop *= s  # 8
    t_len = 220          # pads to 224 -> 28 latent frames
    lat_kw = dict(nf=16, ch_mult=(1, 2), num_res_blocks=2,
                  attn_resolutions=(2,), image_size=LD, centered=True)

    # --- torch reference components ---
    torch.manual_seed(0)
    tvae = _TorchOobleck().eval()
    tlsm = TLSM(
        num_sources=2, max_latent_length=16,
        backbone_args={"_target_": "models.diffsep.ncsnpp.NCSNpp",
                       **{k: list(v) if isinstance(v, tuple) else v
                          for k, v in lat_kw.items()}})
    tlsm.eval()
    t_sde = ref_sdes.sdes.OUVESDE(theta=1.5, sigma_min=0.96, sigma_max=10.0,
                                  N=N_STEPS)

    # --- shared inputs + the entire stochastic budget ---
    rng = np.random.default_rng(23)
    mix_np = (rng.standard_normal((1, 1, t_len)) * 0.1).astype(np.float32)
    t_lat = (t_len + hop - 1) // hop * hop // hop  # 28
    enc_z = rng.standard_normal((1, LD, t_lat)).astype(np.float32)
    lshape = (1, 2, LD, t_lat)
    prior_z = rng.standard_normal(lshape).astype(np.float32)
    corr_z = rng.standard_normal((N_STEPS, 1) + lshape).astype(np.float32)
    pred_z = rng.standard_normal((N_STEPS,) + lshape).astype(np.float32)

    # --- torch pipeline, composed per diffsep_latent.py:107-128,471-487 ---
    with torch.no_grad():
        mix_p = tu.pad(torch.from_numpy(mix_np), hop)      # :108
        h = tvae.encoder.layers(mix_p)
        mean, scale = h.chunk(2, dim=1)                    # bottleneck.py:71
        stdev = torch.nn.functional.softplus(scale) + 1e-4
        lat = mean + stdev * torch.from_numpy(enc_z)       # reparam sample
        mix_lat = lat.unsqueeze(1)                         # :109

    queue = [prior_z]
    for i in range(N_STEPS):
        queue.append(corr_z[i, 0])
        queue.append(pred_z[i])

    def pop(shape, dtype):
        z = torch.from_numpy(queue.pop(0)).to(dtype)
        assert z.shape == torch.Size(shape), (z.shape, shape)
        return z

    sampler = ref_sdes.get_pc_sampler(
        "reverse_diffusion", "ald", sde=t_sde, score_fn=tlsm, y=mix_lat,
        denoise=True, eps=T_EPS, snr=SNR, corrector_steps=1)
    orig_randn_like, orig_randn = torch.randn_like, torch.randn
    torch.randn_like = lambda x, *a, **k: pop(x.shape, x.dtype)
    torch.randn = lambda shape, *a, **k: pop(shape, torch.float32)
    try:
        with torch.no_grad():
            est_lat, ns = sampler()
    finally:
        torch.randn_like, torch.randn = orig_randn_like, orig_randn
    assert not queue and ns == N_STEPS * 2
    with torch.no_grad():                                  # decode :120-128
        b, n, d, sl = est_lat.shape
        est_t = tvae.decode(est_lat.reshape(b * n, d, sl)).reshape(
            b, n, -1).numpy()

    # --- our pipeline: import both weight sets, jit separate_latent ---
    from ditsep_tpu.models import import_params
    from ditsep_tpu.models.oobleck import OobleckVAE
    from ditsep_tpu.models.score_models import LatentScoreModelNCSNpp
    from ditsep_tpu.models.torch_import import import_oobleck_params
    from ditsep_tpu.sdes import OUVESDE
    from ditsep_tpu.training import DiffSepConfig
    from ditsep_tpu.training.diffsep_latent import LatentDiffSepTrainer

    fvae = OobleckVAE(in_channels=1, out_channels=1, channels=CH,
                      c_mults=CM, strides=ST, latent_dim=LD)
    audio0 = jnp.zeros((1, 1, t_len + (hop - t_len % hop)))
    vvars = fvae.init(jax.random.PRNGKey(0), audio0)
    vstate = {k: v.detach().numpy() for k, v in tvae.state_dict().items()
              if "parametrizations" not in k}
    vae_params = {"params": import_oobleck_params(
        vvars["params"], vstate, n_blocks=len(ST))}

    flsm = LatentScoreModelNCSNpp(num_sources=2, max_latent_length=16,
                                  **lat_kw)
    svars = flsm.init(jax.random.PRNGKey(1),
                      jnp.zeros(lshape), jnp.full((1,), 0.5),
                      jnp.zeros((1, 1, LD, t_lat)))
    sstate = {k: v.detach().numpy() for k, v in tlsm.state_dict().items()}
    params = {"params": import_params(svars["params"], sstate)}

    trainer = LatentDiffSepTrainer(
        model=flsm,
        sde=OUVESDE(theta=1.5, sigma_min=0.96, sigma_max=10.0, N=N_STEPS),
        cfg=DiffSepConfig(n_speakers=2, t_eps=T_EPS, sampler_N=N_STEPS,
                          sampler_snr=SNR, sampler_corrector_steps=1),
        vae=fvae)
    noise = (prior_z, corr_z, pred_z)
    sep_jit = jax.jit(lambda p, vp, k, m: trainer.separate_latent(
        p, vp, k, m, N=N_STEPS, enc_noise=jnp.asarray(enc_z),
        noise=noise)[0])
    est_j = np.asarray(sep_jit(params, vae_params, jax.random.PRNGKey(2),
                               jnp.asarray(mix_np)))

    # --- waveform-level agreement ---
    assert est_j.shape == est_t.shape
    scale_ = max(np.max(np.abs(est_t)), 1e-6)
    rel = np.max(np.abs(est_j - est_t)) / scale_
    assert rel < 1e-3, f"waveform relative error {rel}"


@pytest.mark.slow
def test_pc_sampler_noise_injection_matches_prng_free_run():
    """The injectable-noise path must be exactly equivalent to the PRNG
    path when fed the arrays the PRNG would draw -- guards the plumbing
    the oracle test depends on."""
    from ditsep_tpu.sdes import MixSDE, pc_sample

    sde = MixSDE(N=4)
    score = lambda x, t, y: -x
    key = jax.random.PRNGKey(3)
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 512)),
        jnp.float32)

    ref, nfe = pc_sample(sde, score, key, y, N=4)

    # reproduce the PRNG draws with the sampler's key schedule
    k2, k_prior = jax.random.split(key)
    shape = (2, 2, 512)
    prior_z = jax.random.normal(k_prior, shape)
    step_keys = jax.random.split(k2, 8).reshape(4, 2, 2)
    corr_z = jnp.stack([
        jax.random.normal(jax.random.split(step_keys[i, 0])[0], shape)
        for i in range(4)])[:, None]
    pred_z = jnp.stack([
        jax.random.normal(step_keys[i, 1], shape) for i in range(4)])

    out, nfe2 = pc_sample(sde, score, key, y, N=4,
                          noise=(prior_z, corr_z, pred_z))
    assert nfe == nfe2
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
