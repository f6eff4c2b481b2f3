"""Tests: transformer/DiT, bottlenecks, samplers, diffusion trainer,
conditioners, backbones, native IO, composite metrics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.inference import (
    get_alphas_sigmas, sample, sample_rf, truncated_logistic_normal_rescaled,
)
from ditsep_tpu.models.bottleneck import (
    FSQBottleneck, L2Bottleneck, ResidualVQ, TanhBottleneck, VAEBottleneck,
    WassersteinBottleneck,
)
from ditsep_tpu.models.conditioners import (
    IntConditioner, MultiConditioner, NumberConditioner,
)
from ditsep_tpu.models.dit import DiffusionTransformer
from ditsep_tpu.models.transformer import (
    ContinuousTransformer, apply_rotary_pos_emb, rotary_freqs,
    sliding_window_mask,
)
from ditsep_tpu.training.diffusion import (
    CondRouting, DiffusionTrainer, create_source_mixture, diffusion_targets,
    sample_timesteps,
)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------- transformer ---
def test_rotary_preserves_norm():
    t = jax.random.normal(KEY, (2, 4, 10, 64))
    freqs = rotary_freqs(10, 32)
    out = apply_rotary_pos_emb(t, freqs)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(out, axis=-1)),
        np.asarray(jnp.linalg.norm(t, axis=-1)), rtol=1e-5)


def test_sliding_window_mask():
    m = sliding_window_mask(5, 5, (1, 2))
    m = np.asarray(m)
    assert m[2, 1] and m[2, 4] and not m[2, 0] and not m[4, 1]
    assert sliding_window_mask(5, 5, (-1, -1)) is None


def test_transformer_zero_init_is_identity_at_init():
    """zero_init_branch_outputs means the block is the identity at init."""
    ct = ContinuousTransformer(dim=32, depth=2, dim_heads=16)
    x = jax.random.normal(KEY, (2, 8, 32))
    p = ct.init(KEY, x)
    out = ct.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_transformer_mask_blocks_padding():
    ct = ContinuousTransformer(dim=32, depth=1, dim_heads=16,
                               zero_init_branch_outputs=False)
    x = jax.random.normal(KEY, (1, 6, 32))
    p = ct.init(KEY, x)
    mask = jnp.array([[True, True, True, False, False, False]])
    out1 = ct.apply(p, x, mask=mask)
    x2 = x.at[:, 3:].set(99.0)  # junk in masked positions
    out2 = ct.apply(p, x2, mask=mask)
    np.testing.assert_allclose(np.asarray(out1[:, :3]),
                               np.asarray(out2[:, :3]), atol=1e-4)


def test_dit_cfg_scale_one_matches_uncond_path():
    dit = DiffusionTransformer(io_channels=4, embed_dim=32, depth=1,
                               num_heads=2, cond_token_dim=8)
    z = jax.random.normal(KEY, (2, 4, 8))
    t = jnp.array([0.3, 0.6])
    cond = jax.random.normal(KEY, (2, 3, 8))
    p = dit.init(KEY, z, t, cross_attn_cond=cond)
    out1 = dit.apply(p, z, t, cross_attn_cond=cond, cfg_scale=1.0)
    assert out1.shape == z.shape
    out3 = dit.apply(p, z, t, cross_attn_cond=cond, cfg_scale=3.0)
    assert np.isfinite(np.asarray(out3)).all()


# ----------------------------------------------------------- bottlenecks --
def test_bottleneck_shapes_and_props():
    x = jax.random.normal(KEY, (2, 8, 32))
    assert TanhBottleneck().encode(KEY, x).shape == x.shape
    v, info = VAEBottleneck().encode(KEY, x, return_info=True)
    assert v.shape == (2, 4, 32) and float(info["kl"]) > 0
    l2 = L2Bottleneck().encode(KEY, x)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(l2, axis=1)), 1.0, atol=1e-5)
    w, info = WassersteinBottleneck().encode(KEY, x, return_info=True)
    assert np.isfinite(float(info["mmd"]))


def test_rvq_reconstruction_from_indices():
    rvq = ResidualVQ(dim=8, codebook_size=64, num_quantizers=3)
    y = jax.random.normal(KEY, (2, 16, 8))
    variables = rvq.init(KEY, y)
    q, idx, loss = rvq.apply(variables, y)
    rec = rvq.from_indices(variables, idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(q), atol=1e-5)
    assert float(loss) > 0


def test_fsq_quantization_levels():
    f = FSQBottleneck(levels=(8, 5, 5, 5))
    x = jax.random.normal(KEY, (2, 4, 64)) * 3
    q = f.encode(None, x)
    assert float(jnp.abs(q).max()) <= 1.0 + 1e-6
    for d, lv in enumerate(f.levels):
        uniq = np.unique(np.asarray(q[:, d]).round(5))
        assert len(uniq) <= lv
    tok = f.tokens(q)
    assert int(tok.min()) >= 0 and int(tok.max()) < 8 * 5 ** 3


def test_rvq_vae_bottleneck_encode_and_tokens():
    """rvq_vae = VAE reparameterization then residual VQ
    (reference: bottleneck.py:187-219)."""
    from ditsep_tpu.models.bottleneck import RVQVAEBottleneck
    from ditsep_tpu.models.factory import create_bottleneck_from_config

    bn = create_bottleneck_from_config(
        {"type": "rvq_vae",
         "config": {"dim": 8, "codebook_size": 32, "num_quantizers": 3}})
    assert isinstance(bn, RVQVAEBottleneck)
    x = jax.random.normal(KEY, (2, 16, 12))  # 2*dim channels
    variables = bn.quantizer.init(KEY, jnp.zeros((2, 12, 8)))
    q, info = bn.encode(variables, KEY, x, return_info=True)
    assert q.shape == (2, 8, 12)
    assert float(info["kl"]) > 0 and float(info["quantizer_loss"]) > 0
    rec = bn.decode_tokens(variables, info["quantizer_indices"])
    np.testing.assert_allclose(np.asarray(rec), np.asarray(q), atol=1e-5)


def test_dithered_fsq_eval_matches_reference_torch():
    """Eval-mode DitheredFSQ codes/indices match the reference's torch
    quantizer bit for bit (reference: fsq.py:26-131)."""
    import os
    import sys
    from ditsep_tpu.models.factory import create_bottleneck_from_config

    bn = create_bottleneck_from_config(
        {"type": "dithered_fsq",
         "config": {"dim": 4, "levels": [8, 5, 5, 5],
                    "num_codebooks": 2, "noise_dropout": 0.05}})
    assert bn.quantizer.codebook_size == 8 * 5 ** 3
    x = np.random.default_rng(0).normal(size=(2, 8, 24)).astype(np.float32)
    q, info = bn.encode(None, jnp.asarray(x), return_info=True,
                        training=False)
    idx = info["quantizer_indices"]
    assert q.shape == (2, 8, 24) and idx.shape == (2, 2, 24)
    # tokens -> codes round-trips to the quantized latents
    rec = bn.decode_tokens(idx)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(q), atol=1e-5)

    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, ref_src)
    try:
        import torch
        from stable_audio_tools.models.fsq import DitheredFSQ as TorchFSQ
    except ImportError:
        pytest.skip("torch reference fsq unavailable")
    finally:
        sys.path.remove(ref_src)
    tq = TorchFSQ(levels=[8, 5, 5, 5], num_codebooks=2).eval()
    with torch.no_grad():
        codes_t, idx_t = tq(torch.from_numpy(
            np.swapaxes(x, 1, 2).copy()))
    np.testing.assert_allclose(
        np.swapaxes(np.asarray(q), 1, 2), codes_t.numpy(), atol=1e-6)
    np.testing.assert_array_equal(
        np.swapaxes(np.asarray(idx), 1, 2), idx_t.numpy())


def test_dithered_fsq_training_noise_modes():
    """noise_dropout=1 keeps tanh(z) exactly; noise_dropout=0 emits the
    uniformly dithered value, bounded by half a lattice step."""
    from ditsep_tpu.models.bottleneck import DitheredFSQ

    z = jax.random.normal(KEY, (4, 16, 3)) * 2.0
    keep_all = DitheredFSQ(levels=(5, 5, 5), noise_dropout=1.0)
    q = keep_all.quantize(jax.random.PRNGKey(1), z, training=True)
    np.testing.assert_allclose(np.asarray(q), np.asarray(jnp.tanh(z)),
                               atol=1e-6)
    dither_all = DitheredFSQ(levels=(5, 5, 5), noise_dropout=0.0)
    q2 = dither_all.quantize(jax.random.PRNGKey(1), z, training=True)
    half_l = 2.0 / (5 - 1)
    assert float(jnp.abs(q2 - jnp.tanh(z)).max()) <= 0.5 * half_l + 1e-6


# -------------------------------------------------------------- samplers --
def test_ddim_converges_to_fixed_target():
    c = 1.5

    def v_model(x, t, **kw):
        alpha, sigma = get_alphas_sigmas(
            t.reshape(-1, *([1] * (x.ndim - 1))))
        eps = (x - alpha * c) / jnp.maximum(sigma, 1e-6)
        return alpha * eps - sigma * c

    x = jax.random.normal(KEY, (2, 3, 32))
    out = sample(v_model, x, None, steps=30, eta=0.0)
    assert float(jnp.abs(out - c).max()) < 1e-3


@pytest.mark.parametrize("st", ["euler", "rk4", "dpmpp"])
def test_rf_samplers_converge(st):
    c = -0.7

    def rf_model(x, t, **kw):
        tt = t.reshape(-1, *([1] * (x.ndim - 1)))
        return (x - c) / jnp.maximum(tt, 1e-6)

    x = jax.random.normal(KEY, (1, 2, 16))
    out = sample_rf(rf_model, x, steps=30, sampler_type=st)
    assert float(jnp.abs(out - c).max()) < 0.05


# ---------------------------------------------------- diffusion training --
def test_diffusion_targets_v_and_rf():
    x0 = jnp.ones((2, 1, 8))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0.0, 1.0])
    noised, target = diffusion_targets("v", x0, noise, t)
    np.testing.assert_allclose(np.asarray(noised[0]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(noised[1]), 0.0, atol=1e-6)
    noised, target = diffusion_targets("rectified_flow", x0, noise, t)
    np.testing.assert_allclose(np.asarray(target), -1.0, atol=1e-6)


@pytest.mark.parametrize("ts", ["uniform", "logit_normal",
                                "trunc_logit_normal"])
def test_timestep_samplers_in_range(ts):
    t = sample_timesteps(KEY, 2000, ts)
    assert float(t.min()) >= 0.0 and float(t.max()) <= 1.0


def test_phoneme_conditioner_and_factory():
    """Phoneme LUT conditioner + the conditioning-config factory
    (reference: conditioners.py:369-430, 652-726)."""
    from ditsep_tpu.models.conditioners import (
        ARPABET_PHONEMES, HostEmbeddingConditioner, PhonemeConditioner,
        create_multi_conditioner_from_config, phonemes_to_ids,
        text_to_phonemes)

    phones = text_to_phonemes("hello world")
    assert len(phones) > 2 and "_" in phones  # word separator
    ids = phonemes_to_ids(phones)
    assert all(i >= 1 for i in ids)
    assert ids == phonemes_to_ids(phones)  # deterministic
    # unknown symbols map to 1, table symbols to >= 2
    assert phonemes_to_ids(["NOT_A_PHONEME"]) == [1]
    assert phonemes_to_ids([ARPABET_PHONEMES[3]]) == [5]

    pc = PhonemeConditioner(output_dim=16, project_out=True)
    grid = jnp.asarray([[3, 4, 5, 0, 0], [6, 7, 0, 0, 0]], jnp.int32)
    v = pc.init(KEY, grid)
    emb, mask = pc.apply(v, grid)
    assert emb.shape == (2, 5, 16)
    assert mask.tolist() == [[True] * 3 + [False] * 2,
                             [True] * 2 + [False] * 3]

    he = HostEmbeddingConditioner(output_dim=8)
    x = jax.random.normal(KEY, (2, 4, 32))
    vh = he.init(KEY, x)
    embh, maskh = he.apply(vh, x)
    assert embh.shape == (2, 4, 8) and maskh.shape == (2, 4)

    mc = create_multi_conditioner_from_config({
        "cond_dim": 16,
        "configs": [
            {"id": "secs", "type": "number",
             "config": {"min_val": 0, "max_val": 10}},
            {"id": "text", "type": "phoneme", "config": {}},
            {"id": "prompt", "type": "t5", "config": {}},
        ]})
    inputs = {"secs": jnp.array([1.0, 2.0]), "text": grid,
              "prompt": jax.random.normal(KEY, (2, 3, 64))}
    cv = mc.init(KEY, inputs)
    out = mc(cv, inputs)
    assert set(out) == {"secs", "text", "prompt"}
    assert out["text"][0].shape == (2, 5, 16)
    assert out["prompt"][0].shape == (2, 3, 16)


def test_cond_diffusion_trainer_decreases_loss():
    cond_mod = NumberConditioner(output_dim=8, max_val=10)
    mc = MultiConditioner({"secs": cond_mod})
    inputs = {"secs": jnp.array([2.0, 5.0])}
    cvars = mc.init(KEY, inputs)
    cond = mc(cvars, inputs)
    dit = DiffusionTransformer(io_channels=4, embed_dim=32, depth=1,
                               num_heads=2, cond_token_dim=8)
    x0 = jax.random.normal(KEY, (2, 4, 8))
    routing = CondRouting(cross_attn_cond_ids=("secs",))
    p = dit.init(KEY, x0, jnp.array([0.5, 0.5]), **routing.gather(cond))
    tr = DiffusionTrainer(model=dit, routing=routing, lr=2e-3,
                          cfg_dropout_prob=0.0)
    state = tr.init_state(p)
    step = jax.jit(lambda s, k: tr.train_step(s, k, x0, cond))
    losses = [float(step(state, jax.random.PRNGKey(i))[1]["train/loss"])
              for i in range(1)]
    for i in range(6):
        state, m = step(state, jax.random.PRNGKey(i))
        losses.append(float(m["train/loss"]))
    assert all(np.isfinite(losses))
    assert min(losses[-3:]) < losses[0]


def test_create_source_mixture_shapes():
    reals = jax.random.normal(KEY, (4, 1, 64))
    src, shifted = create_source_mixture(KEY, reals, num_sources=2)
    assert src.shape == reals.shape and shifted.shape == reals.shape


# --------------------------------------------------------------- native ---
def test_native_wav_roundtrip_or_skip(tmp_path):
    from ditsep_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    x = (np.sin(np.linspace(0, 50, 4000)) * 0.4).astype(np.float32)
    p = str(tmp_path / "n.wav")
    assert native.write_wav(p, x, 8000)
    data, fs = native.load_wav(p)
    assert fs == 8000
    np.testing.assert_allclose(data.reshape(-1), x, atol=1e-3)
    out = native.collate_center([x[:100], x[:50]], 120)
    assert out.shape == (2, 120)
    np.testing.assert_allclose(out[0, 10:110], x[:100])


# ------------------------------------------------------------- composite --
def test_composite_metrics_properties():
    from ditsep_tpu.eval.composite import llr, ssnr, wss
    rng = np.random.default_rng(0)
    clean = rng.standard_normal(16000) * 0.3
    noisy = clean + 0.2 * rng.standard_normal(16000)
    assert abs(float(np.mean(llr(clean, clean, 16000)))) < 1e-6
    assert float(np.mean(llr(clean, noisy, 16000))) > 0
    assert float(np.mean(wss(clean, noisy, 16000))) > \
        float(np.mean(wss(clean, clean, 16000)))
    _, seg = ssnr(clean, noisy, 16000)
    assert np.all(seg <= 35.0) and np.all(seg >= -10.0)


def test_t5_encode_host_with_injected_offline_encoder():
    """t5_encode_host with an injected random-weight T5 encoder + stub
    tokenizer: the full host-encode -> HostEmbeddingConditioner path runs
    offline (reference: conditioners.py T5Conditioner — the reference
    always downloads; here injection makes the path testable without
    egress)."""
    pytest.importorskip("transformers")
    import numpy as np
    import torch
    from transformers import T5Config, T5EncoderModel

    from ditsep_tpu.models.conditioners import (HostEmbeddingConditioner,
                                                t5_encode_host)

    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=32,
                   num_layers=1, num_heads=2)
    torch.manual_seed(0)
    enc = T5EncoderModel(cfg)

    class StubTok:
        """HF tokenizer call contract: texts -> fixed-length id grid."""

        def __call__(self, texts, truncation, max_length, padding,
                     return_tensors):
            ids = torch.zeros((len(texts), max_length), dtype=torch.long)
            mask = torch.zeros_like(ids)
            for b, t in enumerate(texts):
                toks = [(hash(w) % 62) + 2 for w in t.split()][:max_length]
                ids[b, :len(toks)] = torch.tensor(toks)
                mask[b, :len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    emb, mask = t5_encode_host(["hello world", "a"], max_length=6,
                               tokenizer=StubTok(), encoder=enc)
    assert emb.shape == (2, 6, 16) and mask.shape == (2, 6)
    assert mask.tolist() == [[True, True] + [False] * 4,
                             [True] + [False] * 5]
    assert np.isfinite(emb).all()

    # determinism of the host side under a fixed encoder
    emb2, _ = t5_encode_host(["hello world", "a"], max_length=6,
                             tokenizer=StubTok(), encoder=enc)
    np.testing.assert_array_equal(emb, emb2)

    # projection head consumes the host embeddings
    he = HostEmbeddingConditioner(output_dim=8)
    v = he.init(KEY, jnp.asarray(emb))
    out, m = he.apply(v, jnp.asarray(emb))
    assert out.shape == (2, 6, 8) and m.shape == (2, 6)


def test_clap_encode_host_with_injected_offline_model():
    """clap_encode_host with an injected random-weight tiny ClapModel +
    stub processor: the host CLAP text path runs offline (reference:
    conditioners.py CLAPTextConditioner — the reference always downloads
    laion weights; injection makes the glue testable without egress)."""
    pytest.importorskip("transformers")
    import numpy as np
    import torch
    from transformers import ClapConfig, ClapModel

    from ditsep_tpu.models.conditioners import (HostEmbeddingConditioner,
                                                clap_encode_host)

    cfg = ClapConfig(
        text_config=dict(vocab_size=64, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=32, projection_dim=8),
        audio_config=dict(spec_size=64, patch_size=4, window_size=4,
                          hidden_size=16, depths=[1, 1],
                          num_attention_heads=[2, 2], num_mel_bins=16,
                          patch_embeds_hidden_size=8, projection_dim=8),
        projection_dim=8)
    torch.manual_seed(0)
    model = ClapModel(cfg)

    class StubProc:
        """HF processor call contract for the text path."""

        def __call__(self, text=None, return_tensors=None, padding=None,
                     **kw):
            ids = torch.zeros((len(text), 6), dtype=torch.long)
            mask = torch.zeros_like(ids)
            for b, t in enumerate(text):
                toks = [(hash(w) % 62) + 2 for w in t.split()][:6]
                ids[b, :len(toks)] = torch.tensor(toks)
                mask[b, :len(toks)] = 1
            return {"input_ids": ids, "attention_mask": mask}

    emb, mask = clap_encode_host(texts=["a dog barking", "rain"],
                                 model=model, processor=StubProc())
    assert emb.shape == (2, 1, 8) and mask.shape == (2, 1)
    assert mask.all() and np.isfinite(emb).all()

    # deterministic under a fixed injected model
    emb2, _ = clap_encode_host(texts=["a dog barking", "rain"],
                               model=model, processor=StubProc())
    np.testing.assert_array_equal(emb, emb2)

    # projection head consumes CLAP global embeddings ((B, 1, D))
    he = HostEmbeddingConditioner(output_dim=4)
    v = he.init(KEY, jnp.asarray(emb))
    out, m = he.apply(v, jnp.asarray(emb))
    assert out.shape == (2, 1, 4) and m.shape == (2, 1)


def test_build_mask_matches_reference_torch():
    """Percentage inpainting mask with hann-softened edges + marination
    matches the reference bit for bit
    (reference: inference/generation.py:412-429)."""
    import math

    import torch

    from ditsep_tpu.inference.generation import build_mask

    def ref(sample_size, a):
        ms = math.floor(a["maskstart"] / 100.0 * sample_size)
        me = math.ceil(a["maskend"] / 100.0 * sample_size)
        sl = round(a["softnessL"] / 100.0 * sample_size)
        sr = round(a["softnessR"] / 100.0 * sample_size)
        hann_l = torch.hann_window(sl * 2, periodic=False)[:sl]
        hann_r = torch.hann_window(sr * 2, periodic=False)[sr:]
        m = torch.zeros((sample_size,))
        m[ms:me] = 1
        m[ms:ms + sl] = hann_l
        m[me - sr:me] = hann_r
        if a["marination"] > 0:
            m = m * (1 - a["marination"])
        return m.numpy()

    for a in ({"maskstart": 20, "maskend": 80, "softnessL": 5,
               "softnessR": 10, "marination": 0},
              {"maskstart": 10, "maskend": 90, "softnessL": 20,
               "softnessR": 20, "marination": 0.5}):
        for n in (256, 1000):
            np.testing.assert_allclose(np.asarray(build_mask(n, a)),
                                       ref(n, a), atol=1e-6)


def test_pc_sampler_under_rbg_prng():
    """The PC sampler's key plumbing is PRNG-implementation-agnostic
    (rbg keys are 4 uint32 wide vs threefry's 2)."""
    from ditsep_tpu.sdes import MixSDE, pc_sample

    sde = MixSDE(N=4)
    y = jnp.ones((1, 1, 512))
    key = jax.random.key(0, impl="rbg")
    out, nfe = pc_sample(sde, lambda x, t, c: -x, key, y, N=4,
                         n_spkrs=2)
    assert out.shape == (1, 2, 512)
    assert bool(jnp.isfinite(out).all()) and int(nfe) == 8
