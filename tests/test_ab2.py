"""AB2 multistep sampler tests: analytic-oracle accuracy and trainer
integration."""
import jax
import pytest
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.models import ScoreModelNCSNpp
from ditsep_tpu.sdes import MixSDE, OUVESDE, ab2_sample, bcast_right, pc_sample
from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer

KEY = jax.random.PRNGKey(0)


def _oracle_ouve(c):
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5)

    def score_fn(x, t, yy):
        mean, std = sde.marginal_prob(
            jnp.broadcast_to(jnp.asarray(c), x.shape), t, yy)
        return -(x - mean) / bcast_right(std ** 2, x.ndim)

    return sde, score_fn


def test_ab2_matches_pc_quality_at_half_nfe():
    c = 0.7
    sde, score_fn = _oracle_ouve(c)
    y = jnp.ones((2, 1, 64)) * c
    ab2, nfe_ab2 = ab2_sample(sde, score_fn, KEY, y, N=30, n_spkrs=2)
    pc, nfe_pc = pc_sample(sde, score_fn, KEY, y, N=30, corrector="ald")
    assert nfe_ab2 == 30 and nfe_pc == 60
    err_ab2 = float(jnp.abs(ab2 - c).max())
    err_pc = float(jnp.abs(pc - c).max())
    assert err_ab2 < 2.5 * err_pc  # comparable accuracy at half the NFE
    assert err_ab2 < 0.05


def test_ab2_second_order_convergence():
    """Error should drop superlinearly with N (2nd-order integrator)."""
    c = -0.4
    sde, score_fn = _oracle_ouve(c)
    y = jnp.ones((1, 1, 32)) * c
    errs = {}
    for n in (10, 40):
        out, _ = ab2_sample(sde, score_fn, KEY, y, N=n, n_spkrs=2)
        errs[n] = float(jnp.abs(out - c).max())
    # 4x steps -> >4x error reduction (order > 1)
    assert errs[40] < errs[10] / 4.0


@pytest.mark.slow
def test_ab2_through_trainer_separate():
    model = ScoreModelNCSNpp(num_sources=2, nf=16, ch_mult=(1, 1),
                             attn_resolutions=(), image_size=256)
    tr = DiffSepTrainer(model=model, sde=MixSDE(),
                        cfg=DiffSepConfig(init_hack=5))
    mix = jax.random.normal(KEY, (1, 1, 4000))
    tgt = jax.random.normal(KEY, (1, 2, 4000))
    params = model.init(KEY, tgt, jnp.full((1,), 0.5), mix)
    est, nfe = tr.separate(params, jax.random.PRNGKey(1), mix, N=4,
                           sampler="ab2")
    assert est.shape == (1, 2, 4000)
    assert nfe == 4
    assert np.isfinite(np.asarray(est)).all()
