"""Regression tests for the round-1 self-review findings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.PRNGKey(0)


def test_priormix_multichannel_sig_order():
    """mult_std must scale BEFORE mixing (L = M @ diag(sig)); with a
    per-source sig the order matters (review finding 1)."""
    from ditsep_tpu.sdes import PriorMixSDE
    from ditsep_tpu.sdes.core import mix_mult
    sde = PriorMixSDE(avg_len=4)
    mix = jax.random.normal(KEY, (1, 2, 64))  # per-source mix channels
    t = jnp.array([0.7])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 64))
    std = sde.std(t, mix, 3)
    out = sde.mult_std(std, x)
    expect = mix_mult(std.a, std.b, std.sig * x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect))
    # inverse really inverts
    back = sde.mult_std_inv(std, out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-4,
                               atol=1e-5)


def test_istft_length_uses_tail_samples():
    """istft(length=T) must reconstruct the tail from the OLA buffer, not
    zero-pad (review finding 2); torch parity is covered in test_ops."""
    from ditsep_tpu.ops import istft, stft
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4000)), jnp.float32)
    y = istft(stft(x, 510, 128), 510, 128, length=4000)
    err_tail = float(jnp.abs(y[..., -32:] - x[..., -32:]).max())
    assert err_tail < 1e-3  # previously ~2.5 (zeros)


def test_fit_checkpoints_without_val(tmp_path):
    """Training without a val set must still write a resumable checkpoint
    (review findings 3, 4)."""
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer
    from ditsep_tpu.training.loop import fit
    from ditsep_tpu.data import SyntheticMixDataset

    tr = DiffSepTrainer(
        model=ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1),
                               attn_resolutions=(), image_size=256),
        sde=MixSDE(), cfg=DiffSepConfig(init_hack=0))
    ds = SyntheticMixDataset(n_items=2, min_len_s=0.5, max_len_s=0.5)
    wd = str(tmp_path / "run")
    state = fit(tr, ds, None, workdir=wd, max_epochs=1, batch_size=2,
                n_buckets=1, bucket_multiple=4096, max_steps=1)
    import os
    assert os.path.exists(f"{wd}/checkpoints/latest")
    # resume restores the latest state (step preserved)
    state2 = fit(tr, ds, None, workdir=wd, max_epochs=1, batch_size=2,
                 n_buckets=1, bucket_multiple=4096, max_steps=1,
                 resume=True)
    assert int(state2.step) >= int(state.step)


def test_pallas_downsample_default_and_asymmetric():
    """Default k and asymmetric kernels must match the XLA composite
    (review findings 5, 6)."""
    from ditsep_tpu.ops import downsample_2d
    from ditsep_tpu.ops.pallas_kernels import downsample_2d_pallas
    x = jax.random.normal(KEY, (1, 16, 32, 8))
    # default two-tap kernel -> falls back to composite
    np.testing.assert_allclose(
        np.asarray(downsample_2d_pallas(x)),
        np.asarray(downsample_2d(x)), atol=1e-5)
    # asymmetric 4-tap kernel through the pallas path
    np.testing.assert_allclose(
        np.asarray(downsample_2d_pallas(x, [1, 2, 3, 4])),
        np.asarray(downsample_2d(x, [1, 2, 3, 4])), atol=1e-5)


def test_pallas_fba_large_and_awkward_shapes():
    """Gridded kernel must handle big tensors; awkward row counts fall
    back to the composite (review finding 7)."""
    from ditsep_tpu.ops import fused_leaky_relu
    from ditsep_tpu.ops.pallas_kernels import fused_bias_act_pallas
    b = jax.random.normal(KEY, (64,))
    for shape in [(4, 64, 64, 64), (7919, 64)]:  # big / prime rows
        x = jax.random.normal(KEY, shape)
        np.testing.assert_allclose(
            np.asarray(fused_bias_act_pallas(x, b)),
            np.asarray(fused_leaky_relu(x, b)), atol=1e-5)


def test_ab2_does_not_overshoot():
    """AB2 integrates exactly n-1 segments of the n-point grid (review
    finding 8): with N=2 and zero score, the output is ONE Euler step of
    size (T - eps), not two."""
    from ditsep_tpu.sdes import OUVESDE, ab2_sample
    sde = OUVESDE(theta=1.5)
    y = jnp.ones((1, 1, 16)) * 2.0
    eps = 0.03

    def score_fn(x, t, yy):
        return jnp.zeros_like(x)

    out, nfe = ab2_sample(sde, score_fn, KEY, y, N=2, n_spkrs=1,
                          denoise=False, eps=eps)
    assert nfe == 1  # 1 integration step, no denoise
    # expected: x0 - dt * theta * (y - x0), dt = T - eps, x0 = prior sample
    x0 = sde.prior_sampling(jax.random.split(KEY)[1], (1, 1, 16), y)
    dt = sde.T - eps
    expect = x0 - dt * sde.theta * (y - x0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-4, atol=1e-5)


def test_mixsde_var_three_sources():
    """var uses the general eigen weights (review finding 9)."""
    from ditsep_tpu.sdes import MixSDE
    sde = MixSDE(ndim=3)
    t = jnp.array([0.5])
    ev1, ev2 = sde.cov_eigval(t)
    expect = ev1 / 3 + ev2 * 2 / 3
    np.testing.assert_allclose(np.asarray(sde.var(t)), np.asarray(expect))


def test_sbve_separate_honors_N():
    """separate() must forward N to the SB sampler (review finding 10)."""
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import SBVESDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer
    tr = DiffSepTrainer(
        model=ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1),
                               attn_resolutions=(), image_size=256),
        sde=SBVESDE(N=50), cfg=DiffSepConfig(init_hack=0))
    mix = jax.random.normal(KEY, (1, 1, 2000))
    params = tr.model.init(KEY, jnp.zeros((1, 2, 2000)),
                           jnp.full((1,), 0.5), mix)
    est, nfe = tr.separate(params, jax.random.PRNGKey(1), mix, N=3)
    assert nfe == 3
    assert est.shape == (1, 2, 2000)
