"""Padding-robust (masked-normalization) score-model mode.

Background (docs/pad_dilution_r03.md): the NCSN++ %64 frame padding
dilutes GroupNorm/attention statistics, and batch padding can swing that
dilution far outside the training condition, collapsing separation
quality (-8 dB measured on a trained checkpoint). With
``mask_padding=True`` the score model masks each item's trailing quiet
frames out of every normalization/attention statistic, making the score
function invariant to how much padding rides along (measured on the
trained checkpoint: +10.3 dB at every bucket size, even a whole frame
block of padding).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.models import ScoreModelNCSNpp

# small STFT so the test model is tiny: F = n_fft//2+1 = 32 = image_size
KW = dict(num_sources=2, n_fft=62, hop_length=16, nf=8, ch_mult=(1, 1),
          num_res_blocks=1, attn_resolutions=(16,), image_size=32)


def _inputs(L, key):
    kx, km = jax.random.split(jax.random.PRNGKey(key))
    xt = jax.random.normal(kx, (2, 2, L))
    mix = jax.random.normal(km, (2, 1, L))
    return xt, mix


def test_masked_forward_is_padding_invariant():
    """A masked score call on a zero-padded batch must reproduce the
    native-length call on the valid region (up to local conv/iSTFT
    boundary effects near the signal end): GroupNorm statistics and
    attention rows see identical data either way."""
    model = ScoreModelNCSNpp(mask_padding=True, **KW)
    L1, L2 = 1600, 2600
    xt, mix = _inputs(L1, 0)
    t = jnp.asarray([0.4, 0.8])
    params = model.init(jax.random.PRNGKey(1), xt, t, mix)
    lens = jnp.asarray([L1, L1], dtype=jnp.int32)

    out_native = model.apply(params, xt, t, mix, lengths=lens)
    pad = L2 - L1
    out_padded = model.apply(
        params, jnp.pad(xt, ((0, 0), (0, 0), (0, pad))), t,
        jnp.pad(mix, ((0, 0), (0, 0), (0, pad))), lengths=lens)

    inner = slice(0, L1 - 8 * 16)  # margin for conv boundary leak
    a = np.asarray(out_native[..., inner])
    b = np.asarray(out_padded[..., inner])
    rel = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
    assert rel < 1e-3, rel

    # the UNMASKED model must NOT be invariant (this is the measured
    # dilution defect; if this starts passing, the default semantics
    # changed — investigate before touching the assertion)
    m0 = ScoreModelNCSNpp(mask_padding=False, **KW)
    p0 = m0.init(jax.random.PRNGKey(1), xt, t, mix)
    a0 = np.asarray(m0.apply(p0, xt, t, mix)[..., inner])
    b0 = np.asarray(m0.apply(
        p0, jnp.pad(xt, ((0, 0), (0, 0), (0, pad))), t,
        jnp.pad(mix, ((0, 0), (0, 0), (0, pad))))[..., inner])
    rel0 = np.abs(a0 - b0).max() / (np.abs(a0).max() + 1e-9)
    assert rel0 > rel * 10, (rel0, rel)


def test_masked_static_default_masks_frame_pad():
    """Without per-item lengths, mask_padding still masks the %64 frame
    pad (the training-time default) and stays jit-compatible."""
    model = ScoreModelNCSNpp(mask_padding=True, **KW)
    xt, mix = _inputs(1600, 2)
    t = jnp.asarray([0.5, 0.5])
    params = model.init(jax.random.PRNGKey(3), xt, t, mix)
    out = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))(
        params, xt, t, mix)
    assert out.shape == xt.shape
    assert bool(jnp.isfinite(out).all())


def test_masked_training_step_runs():
    """mask_padding composes with the jitted train step (static mask)."""
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    model = ScoreModelNCSNpp(mask_padding=True, **KW)
    trainer = DiffSepTrainer(model=model, sde=MixSDE(),
                             cfg=DiffSepConfig(init_hack=0))
    xt, mix = _inputs(1600, 4)
    tgt = jnp.stack([mix[:, 0] * 0.5, mix[:, 0] * 0.5], axis=1)
    params = model.init(jax.random.PRNGKey(5), tgt, jnp.asarray([0.5, 0.5]),
                        mix)
    state = trainer.init_state(params)
    state, metrics = jax.jit(trainer.train_step)(
        state, jax.random.PRNGKey(6), (mix, tgt))
    assert np.isfinite(float(metrics["train/score_loss"]))


def test_masked_separate_with_lengths():
    """trainer.separate(lengths=...) threads per-item masks through the
    whole jitted PC sampler."""
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

    model = ScoreModelNCSNpp(mask_padding=True, **KW)
    trainer = DiffSepTrainer(model=model, sde=MixSDE(),
                             cfg=DiffSepConfig(init_hack=0))
    xt, mix = _inputs(2048, 7)
    params = model.init(jax.random.PRNGKey(8), xt, jnp.asarray([0.5, 0.5]),
                        mix)
    lens = jnp.asarray([1600, 2048], dtype=jnp.int32)
    est, nfe = jax.jit(lambda p, k, m: trainer.separate(
        p, k, m, N=2, lengths=lens))(params, jax.random.PRNGKey(9), mix)
    assert est.shape == (2, 2, 2048)
    assert bool(jnp.isfinite(est).all())


def test_latent_masked_forward():
    """LatentScoreModelNCSNpp masks its %max_latent_length pad (a larger
    relative dilution than the waveform model's %64 pad at typical
    lengths) and supports per-item latent-frame lengths."""
    from ditsep_tpu.models import LatentScoreModelNCSNpp

    model = LatentScoreModelNCSNpp(
        num_sources=2, nf=8, ch_mult=(1, 1), num_res_blocks=1,
        attn_resolutions=(), image_size=16, mask_padding=True)
    xt = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 16, 15))
    mix = jax.random.normal(jax.random.PRNGKey(1), (2, 1, 16, 15))
    t = jnp.asarray([0.5, 0.5])
    params = model.init(jax.random.PRNGKey(2), xt, t, mix)
    out = jax.jit(lambda p, a, b, c: model.apply(p, a, b, c))(
        params, xt, t, mix)
    assert out.shape == (2, 2, 16, 15)
    assert bool(jnp.isfinite(out).all())
    lens = jnp.asarray([15, 11], dtype=jnp.int32)
    out2 = model.apply(params, xt, t, mix, lengths=lens)
    assert bool(jnp.isfinite(out2).all())
