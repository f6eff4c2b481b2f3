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


def test_extra_codebook_patterns_roundtrip():
    """Custom-delay / coarse-first / MusicLM patterns invert exactly
    (reference: codebook_patterns.py:302-544)."""
    from ditsep_tpu.models.lm import (CoarseFirstPattern,
                                      CustomDelayPattern, MusicLMPattern)
    tokens = jax.random.randint(KEY, (2, 4, 6), 0, 99)

    pat = CustomDelayPattern(n_q=4, special_token=99, delays=(0, 2, 3, 5))
    d = pat.apply(tokens)
    assert d.shape == (2, 4, 11)
    assert jnp.array_equal(pat.revert(d), tokens)
    assert int(d[0, 3, 0]) == 99  # delayed start is padding

    cf = CoarseFirstPattern(n_q=4, special_token=99, delays=(0, 1, 2))
    g = cf.apply(tokens)
    assert g.shape == (2, 4, cf.seq_len(6))
    assert jnp.array_equal(cf.revert(g), tokens)
    # coarse codebook occupies the first T steps, fine ones only after
    assert jnp.array_equal(g[:, 0, :6], tokens[:, 0])
    assert bool((g[:, 1:, :6] == 99).all())

    ml = MusicLMPattern(n_q=4, special_token=99, group_by=2)
    gm = ml.apply(tokens)
    assert gm.shape == (2, 4, 24)
    assert jnp.array_equal(ml.revert(gm), tokens)
    # each sequence step carries exactly one real token
    assert int(jnp.sum(gm != 99)) == 2 * 4 * 6

    from ditsep_tpu.models.lm import UnrolledPattern
    # full flattening: every codebook on its own inner step
    up = UnrolledPattern(n_q=4, special_token=99)
    gu = up.apply(tokens)
    assert gu.shape == (2, 4, 1 + 4 * 6)
    assert jnp.array_equal(up.revert(gu), tokens)
    assert bool((gu[..., 0] == 99).all())  # leading empty step
    # partial flattening: codebooks 1 and 2 share an inner step
    up2 = UnrolledPattern(n_q=3, special_token=99, flattening=(0, 1, 1))
    t3 = tokens[:, :3]
    gu2 = up2.apply(t3)
    assert gu2.shape == (2, 3, 1 + 2 * 6)
    assert jnp.array_equal(up2.revert(gu2), t3)
    # codebooks 1 and 2 occupy the SAME sequence positions
    assert bool((((gu2[:, 1] != 99) == (gu2[:, 2] != 99))).all())


def test_unrolled_pattern_delays_roundtrip_and_reference_layout():
    """Per-codebook delays on top of unrolling: apply/revert invert
    exactly, and the host-side layout matches the reference's
    UnrolledPatternProvider.get_pattern emission order bit for bit
    (reference: codebook_patterns.py:369-488)."""
    from ditsep_tpu.models.lm import UnrolledPattern
    cases = [
        (3, (0, 1, 1), (0, 3, 3), 4),
        (4, (), (), 5),
        (4, (0, 1, 2, 3), (0, 1, 2, 4), 5),
        (4, (0, 0, 1, 1), (0, 0, 2, 2), 7),
    ]
    for n_q, flat, dly, T in cases:
        pat = UnrolledPattern(n_q=n_q, special_token=99,
                              flattening=flat, delays=dly)
        tokens = jax.random.randint(KEY, (2, n_q, T), 0, 99)
        grid = pat.apply(tokens)
        assert grid.shape == (2, n_q, pat.seq_len(T))
        assert jnp.array_equal(pat.revert(grid), tokens), (flat, dly)

    import os
    import sys
    ref_src = "/root/reference/src"
    if not os.path.isdir(ref_src):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, ref_src)
    try:
        from stable_audio_tools.models.codebook_patterns import (
            UnrolledPatternProvider)
    except Exception:
        sys.path.remove(ref_src)
        pytest.skip("reference codebook_patterns not importable")
    try:
        for n_q, flat, dly, T in cases:
            ref = UnrolledPatternProvider(
                n_q, list(flat) or None, list(dly) or None)
            ref_layout = [[(c.t, c.q) for c in coords]
                          for coords in ref.get_pattern(T).layout]
            ours = UnrolledPattern(n_q=n_q, special_token=99,
                                   flattening=flat, delays=dly)
            assert [list(map(tuple, c)) for c in ours._layout(T)] \
                == ref_layout, (flat, dly)
            assert ours.seq_len(T) == len(ref_layout)
    finally:
        sys.path.remove(ref_src)

    # inconsistent delay across a shared inner step is rejected
    with pytest.raises(AssertionError):
        UnrolledPattern(n_q=3, special_token=99, flattening=(0, 1, 1),
                        delays=(0, 1, 2))


def test_lm_conformer_backbone_variant():
    """The conformer knob (and generic backbone kwargs) reach the
    ContinuousTransformer, as with the reference backbone's **kwargs
    passthrough (lm_backbone.py:102-120)."""
    from ditsep_tpu.models.lm import AudioLM, DelayPattern, lm_loss
    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=1,
                 num_heads=2, conformer=True)
    pat = DelayPattern(2, 16)
    tokens = jax.random.randint(KEY, (2, 2, 6), 0, 16)
    params = lm.init(KEY, pat.apply(tokens))
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("conformer" in jax.tree_util.keystr(p) for p, _ in flat)
    loss = lm_loss(lm, params, tokens, pat)
    assert np.isfinite(float(loss))


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


def test_lm_kv_cache_matches_full_pass():
    """Incremental decode through the KV cache must produce the same
    logits as the full causal pass (same params, same inputs)."""
    from ditsep_tpu.models.lm import AudioLM
    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=2,
                 num_heads=2)
    tokens = jax.random.randint(KEY, (2, 2, 6), 0, 16)
    params = lm.init(KEY, tokens)
    full = lm.apply(params, tokens)  # (B, n_q, 6, C)

    cache = lm.init_cache(2, 6)
    step_logits = []
    for i in range(6):
        lg, cache = lm.apply(params, tokens[..., i:i + 1], cache=cache,
                             cache_index=jnp.asarray(i, jnp.int32))
        step_logits.append(lg[:, :, 0])
    inc = jnp.stack(step_logits, axis=2)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_lm_kv_cache_prefill_matches_full_pass():
    """Multi-token prefill (prepend conditioning + first tokens) must
    agree with the full pass too."""
    from ditsep_tpu.models.lm import AudioLM
    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=1,
                 num_heads=2, prepend_cond_dim=8)
    tokens = jax.random.randint(KEY, (1, 2, 5), 0, 16)
    prep = jax.random.normal(KEY, (1, 3, 8))
    params = lm.init(KEY, tokens, prepend_cond=prep)
    full = lm.apply(params, tokens, prepend_cond=prep)

    cache = lm.init_cache(1, 3 + 5)
    lg, cache = lm.apply(params, tokens, prepend_cond=prep, cache=cache,
                         cache_index=jnp.asarray(0, jnp.int32))
    np.testing.assert_allclose(np.asarray(lg), np.asarray(full),
                               rtol=2e-4, atol=2e-4)


def test_lm_generate_sampling_modes_and_cfg():
    from ditsep_tpu.models.lm import AudioLM, lm_generate
    lm = AudioLM(n_quantizers=2, codebook_size=16, dim=32, depth=1,
                 num_heads=2, cross_attn_cond_dim=8)
    tokens = jax.random.randint(KEY, (1, 2, 4), 0, 16)
    ctx = jax.random.normal(KEY, (1, 5, 8))
    params = lm.init(KEY, tokens, cross_attn_cond=ctx)

    # greedy is deterministic
    g1 = lm_generate(lm, params, KEY, 1, 4, temperature=0.0,
                     cross_attn_cond=ctx)
    g2 = lm_generate(lm, params, jax.random.PRNGKey(9), 1, 4,
                     temperature=0.0, cross_attn_cond=ctx)
    assert jnp.array_equal(g1, g2)
    # top-k / top-p / CFG paths produce valid tokens
    for kw in ({"top_k": 4}, {"top_p": 0.8}, {"cfg_scale": 2.0}):
        g = lm_generate(lm, params, KEY, 1, 4, cross_attn_cond=ctx, **kw)
        assert g.shape == (1, 2, 4)
        assert int(g.min()) >= 0 and int(g.max()) < 16


def test_lm_generate_nondefault_patterns_in_range():
    """lm_generate must derive the valid-position mask from the pattern
    itself: ParallelPattern (all positions valid), CustomDelayPattern
    with non-default delays, and UnrolledPattern must all yield tokens
    inside the codec range -- never the special token (= codebook_size)."""
    from ditsep_tpu.models.lm import (AudioLM, CustomDelayPattern,
                                      ParallelPattern, UnrolledPattern,
                                      lm_generate)
    lm = AudioLM(n_quantizers=3, codebook_size=16, dim=32, depth=1,
                 num_heads=2)
    tokens = jax.random.randint(KEY, (1, 3, 6), 0, 16)
    params = lm.init(KEY, tokens)
    patterns = [
        ParallelPattern(3, 16),
        CustomDelayPattern(3, 16, delays=(0, 2, 5)),
        UnrolledPattern(3, 16),
        UnrolledPattern(3, 16, flattening=(0, 1, 1), delays=(0, 2, 2)),
    ]
    for pat in patterns:
        g = lm_generate(lm, params, KEY, batch=1, length=4, pattern=pat)
        assert g.shape == (1, 3, 4), type(pat).__name__
        assert int(g.min()) >= 0 and int(g.max()) < 16, type(pat).__name__


def test_lm_top_p_and_top_k_masks():
    from ditsep_tpu.models.lm import _mask_top_k, _mask_top_p
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    mk = _mask_top_k(logits, 2)
    assert np.isfinite(np.asarray(mk[0, :2])).all()
    assert np.isneginf(np.asarray(mk[0, 2:])).all()
    # p=0.75: keep tokens until exclusive prefix mass reaches 0.75
    mp = _mask_top_p(logits, 0.75)
    assert np.isfinite(np.asarray(mp[0, :2])).all()
    assert np.isneginf(np.asarray(mp[0, 3])).all()


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


def test_stereoize_mono_to_stereo_prior():
    """Dual-mono-conditioned stereo generation (reference:
    diffusion_prior.py:16-78 MonoToStereoDiffusionPrior)."""
    from ditsep_tpu.inference import stereoize
    from ditsep_tpu.models.dit import DiffusionTransformer

    dit = DiffusionTransformer(io_channels=2, embed_dim=32, depth=1,
                               num_heads=2, input_concat_dim=2)
    x = jax.random.normal(KEY, (1, 2, 48))
    params = dit.init(KEY, x, jnp.full((1,), 0.5),
                      input_concat_cond=jnp.zeros((1, 2, 48)))

    def model_apply(xx, t, **kw):
        return dit.apply(params, xx, t, **kw)

    mono = jax.random.normal(KEY, (1, 1, 45))  # pads to min_input_length
    out = stereoize(model_apply, jax.random.PRNGKey(1), mono, steps=3,
                    min_input_length=16)
    assert out.shape == (1, 2, 45)
    assert bool(jnp.isfinite(out).all())


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
                         vq_num_q_p=1, vq_num_q_c=1, vq_num_q_r=1,
                         codebook_size=32, timbre_layers=1,
                         phone_classes=11, use_gr_prosody_phone=True,
                         use_gr_content_f0=True)
    pd = dec.init(KEY, h, return_info=True)
    audio, info = dec.apply(pd, h, return_info=True)
    assert audio.shape == x.shape
    # eval-mode commit loss is zero (reference fvq.py:72-74)
    assert float(info["vq_loss"]) == 0.0
    assert info["indices"].shape == (1, 32, 3)
    # supervision + disentanglement heads (facodec.py:477-511)
    assert info["f0"].shape == info["uv"].shape == (1, 32)
    assert info["phone"].shape == (1, 32, 11)
    assert info["prosody_phone"].shape == (1, 32, 11)
    assert info["content_f0"].shape == (1, 32)
    assert info["spk_embs"].shape == (1, 16)

    # voice conversion: decode the same codes under a different speaker
    emb = dec.apply(pd, info["codes"], method=dec.vq2emb)
    assert emb.shape == h.shape
    other = jax.random.normal(KEY, (1, 16))
    vc = dec.apply(pd, emb, other, method=dec.decode_with_timbre)
    assert vc.shape == x.shape
    assert not np.allclose(np.asarray(vc), np.asarray(audio))

    # random residual masking path needs the rvq_mask rng; train mode
    # also computes the commitment/codebook VQ losses
    audio_tr, info_tr = dec.apply(pd, h, train=True, return_info=True,
                                  rngs={"rvq_mask": jax.random.PRNGKey(1)})
    assert audio_tr.shape == x.shape
    assert float(info_tr["vq_loss"]) > 0

    g = jax.grad(lambda z: jnp.sum(gradient_reversal(z, 3.0) * 2.0))(
        jnp.ones((2,)))
    np.testing.assert_allclose(np.asarray(g), -6.0)


# -------------------------------------------------------- pretransforms ---
def test_dac_rvq_bottlenecks():
    """DAC residual VQ: cosine-lookup quantization, separated commitment/
    codebook losses, token round-trip, quantizer dropout, and both
    bottleneck wrappers (reference: bottleneck.py:221-325)."""
    from ditsep_tpu.models.bottleneck import (
        DACResidualVQ, DACRVQBottleneck, DACRVQVAEBottleneck)
    q = DACResidualVQ(input_dim=16, n_codebooks=3, codebook_size=32,
                      codebook_dim=4)
    x = jax.random.normal(KEY, (2, 10, 16))
    v = q.init(KEY, x)
    z, codes, latents, commit, cb = q.apply(v, x)
    assert z.shape == x.shape
    assert codes.shape == (2, 10, 3)
    assert latents.shape == (2, 10, 12)  # Q * codebook_dim
    assert float(commit) > 0 and float(cb) > 0
    # from_codes reproduces the quantized output exactly
    z2 = q.from_codes(v, codes)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z), rtol=1e-5,
                               atol=1e-5)
    # quantizer dropout uses fewer stages
    z1, codes1, *_ = q.apply(v, x, n_quantizers=1)
    assert codes1.shape == (2, 10, 1)
    assert float(jnp.abs(z1 - z).max()) > 1e-6

    bn = DACRVQBottleneck(q, noise_augment_dim=2)
    xc = jnp.swapaxes(x, 1, -1)  # (B, C, T)
    zc, info = bn.encode(v, xc, return_info=True)
    assert zc.shape == xc.shape
    assert np.isfinite(float(info["vq/commitment_loss"]))
    dec = bn.decode(v, zc, key=jax.random.PRNGKey(3))
    assert dec.shape == (2, 18, 10)  # +noise_augment_dim channels
    tok = bn.decode_tokens(v, info["codes"], key=jax.random.PRNGKey(3))
    assert tok.shape == dec.shape

    # VAE variant: input carries (mean, scale) channel pairs
    qv = DACResidualVQ(input_dim=8, n_codebooks=2, codebook_size=16,
                       codebook_dim=4)
    xv = jax.random.normal(KEY, (2, 16, 10))  # 2*8 channels
    vv = qv.init(KEY, jnp.swapaxes(xv[:, :8], 1, -1))
    bnv = DACRVQVAEBottleneck(qv)
    zv, infov = bnv.encode(vv, jax.random.PRNGKey(1), xv, return_info=True)
    assert zv.shape == (2, 8, 10)
    assert np.isfinite(float(infov["kl"]))

    # factory dispatch
    from ditsep_tpu.models.factory import create_bottleneck_from_config
    assert isinstance(create_bottleneck_from_config(
        {"type": "dac_rvq", "config": {"input_dim": 16,
                                       "n_codebooks": 3}}),
        DACRVQBottleneck)
    assert isinstance(create_bottleneck_from_config(
        {"type": "dac_rvq_vae", "config": {"input_dim": 8}}),
        DACRVQVAEBottleneck)


def test_semantic_feature_loss_core():
    """Std-normalised per-layer L1 (reference: semantic.py:69-80):
    identical features -> 0; selection honours feature_ids; scale
    normalisation keeps the loss size-invariant."""
    from ditsep_tpu.training.semantic import HubertLoss, semantic_feature_l1
    rng = np.random.default_rng(0)
    f1 = [rng.standard_normal((2, 10, 8)) for _ in range(3)]
    f2 = [f + 0.1 * rng.standard_normal(f.shape) for f in f1]
    assert float(semantic_feature_l1(f1, f1)) == 0.0
    v_all = float(semantic_feature_l1(f1, f2))
    assert 0 < v_all < 1.0
    v_one = float(semantic_feature_l1(f1, f2, feature_ids=[1]))
    assert v_one > 0
    # scaling both by 10 leaves the normalised loss invariant
    v_scaled = float(semantic_feature_l1(
        [10 * f for f in f1], [10 * f for f in f2]))
    assert abs(v_scaled - v_all) < 1e-5
    # API surface: construction works without weights; bad name rejected
    hl = HubertLoss(feature_ids=[-1], weight=2.0)
    assert hl.model_name == "HUBERT_LARGE"
    with pytest.raises(ValueError):
        HubertLoss(model_name="NOT_A_MODEL")


def test_kaiser_alias_free_filters():
    """Frequency response of the Kaiser-sinc filters: passband ~unity,
    stopband strongly attenuated; up/down round trip preserves a
    band-limited signal (reference: alias_free_torch/filter.py:27-96,
    resample.py:9-57)."""
    from ditsep_tpu.models.facodec import (
        downsample1d, kaiser_sinc_filter1d, lowpass_filter1d, upsample1d)
    h = kaiser_sinc_filter1d(cutoff=0.25, half_width=0.3, kernel_size=12)
    assert abs(float(h.sum()) - 1.0) < 1e-6
    H = np.abs(np.fft.rfft(h, 512))
    freqs = np.linspace(0, 0.5, len(H))
    assert H[freqs < 0.05].min() > 0.9          # passband
    assert H[freqs > 0.45].max() < 0.12         # stopband

    # band-limited sine round-trips through up/down sampling
    t = np.arange(512)
    x = np.sin(2 * np.pi * 0.05 * t).astype(np.float32)[None, :, None]
    up = upsample1d(jnp.asarray(x), 2)
    assert up.shape == (1, 1024, 1)
    down = downsample1d(up, 2)
    err = np.abs(np.asarray(down[0, 32:480, 0]) - x[0, 32:480, 0]).max()
    assert err < 0.05
    # lowpass kills an above-cutoff sine
    hi = np.sin(2 * np.pi * 0.45 * t).astype(np.float32)[None, :, None]
    out = lowpass_filter1d(jnp.asarray(hi), cutoff=0.2, half_width=0.1,
                           kernel_size=24)
    assert float(jnp.abs(out[0, 32:480, 0]).max()) < 0.1


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
@pytest.mark.slow
def test_dac_discriminator_and_gan_loss():
    """DAC multi-discriminator (MPD+MSD+MRD): fmap contract, LSGAN loss
    values, and gradient flow to BOTH discriminator and generator sides
    (reference: discriminators.py:553-661)."""
    from ditsep_tpu.models.discriminators import (
        DACDiscriminator, dac_gan_loss)
    disc = DACDiscriminator(periods=(2, 3), rates=(2,),
                            fft_sizes=(256, 128))
    reals = jax.random.normal(KEY, (2, 1, 2048))
    fakes = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 2048))
    params = disc.init(KEY, reals)
    fmaps = disc.apply(params, reals)
    assert len(fmaps) == 5  # 2 periods + 1 rate + 2 ffts
    dis, gen, feat = dac_gan_loss(disc, params, reals, fakes)
    assert all(np.isfinite(float(v)) for v in (dis, gen, feat))
    # hinge variant
    dis_h, gen_h, _ = dac_gan_loss(disc, params, reals, fakes,
                                   use_hinge=True)
    assert np.isfinite(float(dis_h)) and np.isfinite(float(gen_h))
    # gradients reach the discriminator params
    g = jax.grad(lambda p: dac_gan_loss(disc, p, reals, fakes)[0])(params)
    gnorm = sum(float(jnp.sum(x ** 2)) for x in jax.tree.leaves(g))
    assert gnorm > 0
    # generator gradient flows through fakes
    gf = jax.grad(lambda f: dac_gan_loss(disc, params, reals, f)[1])(fakes)
    assert float(jnp.sum(gf ** 2)) > 0


def test_bigvgan_discriminator_and_factory():
    from ditsep_tpu.models.discriminators import (
        BigVGANDiscriminator, DACDiscriminator, MultiScaleSTFTDiscriminator,
        OobleckDiscriminator, create_discriminator_from_config,
        dac_gan_loss, discriminator_loss)
    disc = BigVGANDiscriminator(sample_rate=8000, periods=(2, 3))
    x = jax.random.normal(KEY, (1, 1, 4096))
    params = disc.init(KEY, x)
    fmaps = disc.apply(params, x)
    assert len(fmaps) == 3  # 2 MPD + 1 CQT
    dis, gen, feat = dac_gan_loss(disc, params, x, x * 0.5)
    assert np.isfinite(float(dis))

    # reference-style config dispatch (training/autoencoders.py:150-157)
    assert isinstance(create_discriminator_from_config(
        {"type": "encodec", "config": {"filters": 8,
                                       "n_ffts": [256, 128],
                                       "hop_lengths": [64, 32]}}),
        MultiScaleSTFTDiscriminator)
    assert isinstance(create_discriminator_from_config(
        {"type": "oobleck", "config": {}}), OobleckDiscriminator)
    d = create_discriminator_from_config(
        {"type": "dac", "config": {"periods": [2, 3],
                                   "fft_sizes": [256, 128]}})
    assert isinstance(d, DACDiscriminator) and d.periods == (2, 3)
    b = create_discriminator_from_config(
        {"type": "big_vgan", "config": {"periods": [2]}},
        sample_rate=16000)
    assert isinstance(b, BigVGANDiscriminator) and b.sample_rate == 16000
    # generic loss dispatch keeps the (dis, adv, fm) contract
    pd = d.init(KEY, x)
    out = discriminator_loss(d, pd, x, x * 0.7)
    assert len(out) == 3


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


def test_create_pretransform_from_config_dispatch():
    """Pretransform factory covers the reference's six types
    (reference: factory.py:32-88)."""
    import dataclasses

    from ditsep_tpu.models.factory import create_pretransform_from_config
    from ditsep_tpu.models.pretransforms import (
        AutoencoderPretransform, DACPretransform, PatchedPretransform,
        PQMFPretransform, WaveletPretransform,
    )

    assert isinstance(create_pretransform_from_config(
        {"type": "wavelet", "config": {"channels": 2, "levels": 3,
                                       "wavelet": "haar"}}),
        WaveletPretransform)
    assert isinstance(create_pretransform_from_config(
        {"type": "pqmf", "config": {"bands": 4, "taps": 64}}),
        PQMFPretransform)
    assert isinstance(create_pretransform_from_config(
        {"type": "patched", "config": {"channels": 1, "patch_size": 4}}),
        PatchedPretransform)
    with pytest.raises(NotImplementedError):
        create_pretransform_from_config(
            {"type": "audiocraft_pretrained", "config": {}})

    ae = create_pretransform_from_config(
        {"type": "autoencoder", "scale": 2.0,
         "config": {
             "encoder": {"type": "oobleck",
                         "config": {"in_channels": 1, "channels": 8,
                                    "latent_dim": 8, "c_mults": [1, 2],
                                    "strides": [2, 2]}},
             "decoder": {"type": "oobleck",
                         "config": {"out_channels": 1, "channels": 8,
                                    "latent_dim": 4, "c_mults": [1, 2],
                                    "strides": [2, 2]}},
             "bottleneck": {"type": "vae"},
             "latent_dim": 4}},
        sample_rate=8000)
    assert isinstance(ae, AutoencoderPretransform)
    x = jnp.ones((2, 1, 64))
    z = ae.encode(x)
    assert z.shape == (2, 4, 16)
    y = ae.decode(z)
    assert y.shape == (2, 1, 64)

    # weights are swappable for imported checkpoints
    ae2 = dataclasses.replace(ae, params=ae.params)
    assert isinstance(ae2, AutoencoderPretransform)


def test_dac_pretransform_token_roundtrip():
    """The DAC pretransform's quantize/tokenize paths are mutually
    consistent (reference: pretransforms.py:150-209)."""
    from ditsep_tpu.models.bottleneck import DACResidualVQ
    from ditsep_tpu.models.codecs import DACDecoderWrapper, DACEncoderWrapper
    from ditsep_tpu.models.pretransforms import DACPretransform

    key = jax.random.PRNGKey(0)
    enc = DACEncoderWrapper(d_model=4, strides=(2, 2))
    dec = DACDecoderWrapper(latent_dim=16, channels=16, rates=(2, 2))
    q = DACResidualVQ(input_dim=16, n_codebooks=2, codebook_size=8,
                      codebook_dim=4)
    k1, k2, k3 = jax.random.split(key, 3)
    lat = jnp.zeros((1, 4, 16))
    pre = DACPretransform(
        encoder=enc, decoder=dec, quantizer=q,
        params={"encoder": enc.init(k1, jnp.zeros((1, 16, 1))),
                "decoder": dec.init(k3, lat),
                "quantizer": q.init(k2, lat)},
        quantize_on_decode=False)
    assert pre.downsampling_ratio == 4
    assert pre.encoded_channels == 16
    assert pre.num_quantizers == 2 and pre.codebook_size == 8

    x = jax.random.normal(key, (2, 1, 32))
    z = pre.encode(x)          # already quantized (quantize_on_decode=False)
    assert z.shape == (2, 16, 8)
    y = pre.decode(z)
    assert y.shape == (2, 1, 32) and bool(jnp.isfinite(y).all())

    tok = pre.tokenize(x)
    assert tok.shape == (2, 2, 8)
    assert int(tok.min()) >= 0 and int(tok.max()) < 8
    y_tok = pre.decode_tokens(tok)
    assert y_tok.shape == (2, 1, 32)

    # quantize-on-decode composes the same end-to-end map as
    # tokenize -> decode_tokens
    import dataclasses
    pre_qod = dataclasses.replace(pre, quantize_on_decode=True)
    z_cont = pre_qod.encode(x)
    np.testing.assert_allclose(np.asarray(pre_qod.decode(z_cont)),
                               np.asarray(y_tok), atol=1e-4)


def test_pretransform_factory_generic_autoencoder():
    """Non-oobleck autoencoder pretransforms (generic encoder/decoder +
    bottleneck composition) initialize and round-trip; the generic AE
    exposes downsampling_ratio like the reference AudioAutoencoder
    (reference: autoencoders.py:416)."""
    from ditsep_tpu.models.factory import create_pretransform_from_config

    pre = create_pretransform_from_config(
        {"type": "autoencoder",
         "config": {
             "encoder": {"type": "dac",
                         "config": {"d_model": 4, "strides": [2, 2],
                                    "latent_dim": 8, "in_channels": 1}},
             "decoder": {"type": "dac",
                         "config": {"latent_dim": 8, "channels": 8,
                                    "rates": [2, 2], "out_channels": 1}},
             "bottleneck": {"type": "tanh"},
             "latent_dim": 8}},
        sample_rate=8000)
    assert pre.downsampling_ratio == 4
    z = pre.encode(jnp.ones((1, 1, 32)))
    assert z.shape == (1, 8, 8)
    assert pre.decode(z).shape == (1, 1, 32)
