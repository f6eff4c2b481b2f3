"""3-speaker separation support (the reference supports wsj0-3mix /
Libri3Mix; permutation logic must scale to 3! = 6 perms) and the
enhancement-as-separation flow (Valentini)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.models import ScoreModelNCSNpp
from ditsep_tpu.sdes import MixSDE
from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer, si_sdr_pit

# heavyweight end-to-end tests: deselect with -m 'not slow' for quick
# iteration (the full suite still runs them)
pytestmark = pytest.mark.slow

KEY = jax.random.PRNGKey(0)


def _trainer3():
    model = ScoreModelNCSNpp(
        num_sources=3, nf=16, ch_mult=(1, 1), attn_resolutions=(),
        image_size=256)
    sde = MixSDE(ndim=3)
    return DiffSepTrainer(model=model, sde=sde,
                          cfg=DiffSepConfig(n_speakers=3, init_hack=5))


def test_three_speaker_training_and_separation():
    tr = _trainer3()
    mix = jax.random.normal(KEY, (2, 1, 4000))
    tgt = jax.random.normal(KEY, (2, 3, 4000)) * 0.5
    params = tr.model.init(KEY, tgt, jnp.full((2,), 0.5), mix)
    loss = tr.training_loss(params, jax.random.PRNGKey(1), mix, tgt)
    assert np.isfinite(float(loss))
    est, nfe = tr.separate(params, jax.random.PRNGKey(2), mix, N=2)
    assert est.shape == (2, 3, 4000)


def test_si_sdr_pit_three_sources():
    ref = jax.random.normal(KEY, (2, 3, 2000))
    perm = [2, 0, 1]
    est = ref[:, perm, :]
    v = si_sdr_pit(est, ref, clamp_db=30.0)
    assert np.all(np.asarray(v) > 25.0)


def test_bss_eval_three_sources():
    from ditsep_tpu.eval import si_bss_eval_sources
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((3, 3000))
    est = ref[[1, 2, 0]] + 0.05 * rng.standard_normal((3, 3000))
    sdr, sir, sar, perm = si_bss_eval_sources(ref, est)
    # fast_bss_eval orientation: est[perm] aligns to ref
    assert list(perm) == [2, 0, 1]
    np.testing.assert_allclose(est[perm], ref, atol=0.25)
    assert np.all(sdr > 15)


def test_enhancement_as_two_source_separation():
    """Valentini framing: (noisy, [clean, noise]) pairs through the same
    trainer (reference: src/datasets/vctk_demand.py:60-79)."""
    model = ScoreModelNCSNpp(
        num_sources=2, nf=16, ch_mult=(1, 1), attn_resolutions=(),
        image_size=256)
    tr = DiffSepTrainer(model=model, sde=MixSDE(),
                        cfg=DiffSepConfig(init_hack=5))
    rng = np.random.default_rng(0)
    clean = rng.standard_normal((2, 1, 4000)).astype(np.float32) * 0.3
    noise = rng.standard_normal((2, 1, 4000)).astype(np.float32) * 0.1
    noisy = clean + noise
    tgt = np.concatenate([clean, noise], axis=1)
    params = tr.model.init(KEY, jnp.asarray(tgt), jnp.full((2,), 0.5),
                           jnp.asarray(noisy))
    loss = tr.training_loss(params, KEY, jnp.asarray(noisy),
                            jnp.asarray(tgt))
    assert np.isfinite(float(loss))
