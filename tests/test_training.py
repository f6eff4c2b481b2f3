"""Training-layer tests: losses, PIT variants, train step, sharding."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.models import ScoreModelNCSNpp
from ditsep_tpu.sdes import MixSDE, OUVESDE, SBVESDE
from ditsep_tpu.training import (
    DiffSepConfig, DiffSepTrainer, si_sdr_pit, si_sdr_loss,
)
from ditsep_tpu.utils import separate as sep_utils


# ---------------------------------------------------------------- SI-SDR --
def test_si_sdr_perfect_reconstruction_clamps():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 4000))
    v = si_sdr_pit(x, x, clamp_db=30.0)
    assert np.all(np.asarray(v) <= 30.1)  # soft clamp, float32 slack
    assert np.all(np.asarray(v) >= 29.0)


def test_si_sdr_pit_finds_permutation():
    key = jax.random.PRNGKey(1)
    ref = jax.random.normal(key, (3, 2, 2000))
    est = ref[:, ::-1, :]  # swapped sources
    v = si_sdr_pit(est, ref, clamp_db=30.0)
    assert np.all(np.asarray(v) > 25.0)


def test_si_sdr_scale_invariance():
    key = jax.random.PRNGKey(2)
    ref = jax.random.normal(key, (1, 2, 2000))
    noise = 0.1 * jax.random.normal(jax.random.PRNGKey(3), ref.shape)
    est = ref + noise
    v1 = si_sdr_pit(est * 3.7, ref)
    v2 = si_sdr_pit(est, ref)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-3)


def test_si_sdr_matches_definition():
    """Cross-check against a direct numpy implementation."""
    rng = np.random.default_rng(0)
    ref = rng.standard_normal((1, 2, 1000)).astype(np.float32)
    est = ref + 0.1 * rng.standard_normal((1, 2, 1000)).astype(np.float32)

    def np_si_sdr(e, r):
        alpha = (e * r).sum() / (r * r).sum()
        target = alpha * r
        noise = e - target
        return 10 * np.log10((target ** 2).sum() / (noise ** 2).sum())

    expected = np.mean([np_si_sdr(est[0, i], ref[0, i]) for i in range(2)])
    got = float(si_sdr_pit(jnp.asarray(est), jnp.asarray(ref))[0])
    assert abs(got - expected) < 0.05


# ----------------------------------------------------------- batch utils --
def test_normalize_batch_roundtrip():
    key = jax.random.PRNGKey(0)
    mix = 5.0 + 3.0 * jax.random.normal(key, (4, 1, 1000))
    tgt = jax.random.normal(key, (4, 2, 1000))
    (m2, t2), mean, std = sep_utils.normalize_batch((mix, tgt))
    assert np.allclose(np.asarray(jnp.mean(m2, axis=(1, 2))), 0, atol=1e-5)
    back = sep_utils.denormalize_batch(m2, mean, std)
    np.testing.assert_allclose(np.asarray(back), np.asarray(mix), atol=1e-4)


def test_shuffle_sources_permutes_rows():
    key = jax.random.PRNGKey(3)
    x = jnp.stack([jnp.zeros((8, 100)), jnp.ones((8, 100))], axis=1)
    y = sep_utils.shuffle_sources(key, x)
    sums = np.asarray(jnp.sum(y, axis=-1))
    # every row still contains one all-zeros and one all-ones source
    assert all(sorted(s) == [0.0, 100.0] for s in sums)


def test_power_order_sources():
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (3, 1, 500)) * 5.0
    b = jax.random.normal(key, (3, 1, 500)) * 0.1
    x = jnp.concatenate([a, b], axis=1)
    y = sep_utils.power_order_sources(x)
    v = np.asarray(jnp.var(y, axis=-1))
    assert np.all(v[:, 0] <= v[:, 1])


# ------------------------------------------------------------- trainer ----
def _tiny_trainer(sde, **cfg_kw):
    model = ScoreModelNCSNpp(
        num_sources=2, nf=16, ch_mult=(1, 1), attn_resolutions=(),
        image_size=256)
    cfg = DiffSepConfig(**cfg_kw)
    return DiffSepTrainer(model=model, sde=sde, cfg=cfg)


def _init(trainer, t_len=4000, batch=2):
    key = jax.random.PRNGKey(0)
    mix = jax.random.normal(key, (batch, 1, t_len))
    tgt = jax.random.normal(key, (batch, 2, t_len)) * 0.5
    tgt = tgt.at[:, :1].set(mix - tgt[:, 1:])  # sources sum to mix
    params = trainer.model.init(key, tgt, jnp.ones((batch,)) * 0.5, mix)
    return params, mix, tgt


@pytest.mark.parametrize("sde", [MixSDE(), OUVESDE(), SBVESDE()],
                         ids=["mix", "ouve", "sbve"])
def test_training_loss_finite_all_sdes(sde):
    tr = _tiny_trainer(sde)
    params, mix, tgt = _init(tr)
    loss = tr.training_loss(params, jax.random.PRNGKey(1), mix, tgt)
    assert np.isfinite(float(loss))


@pytest.mark.parametrize("hack", [5, 6, 7])
def test_init_hack_variants(hack):
    tr = _tiny_trainer(MixSDE(), init_hack=hack)
    params, mix, tgt = _init(tr)
    loss = tr.training_loss(params, jax.random.PRNGKey(1), mix, tgt)
    assert np.isfinite(float(loss))


def test_pit_loss_invariant_to_target_permutation():
    """The t=T PIT loss must not depend on the order of the target
    sources (that is its entire purpose)."""
    tr = _tiny_trainer(MixSDE())
    params, mix, tgt = _init(tr)
    key = jax.random.PRNGKey(7)
    l1 = tr.compute_score_loss_init_hack_pit(params, key, mix, tgt)
    l2 = tr.compute_score_loss_init_hack_pit(params, key, mix,
                                             tgt[:, ::-1, :])
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-4)


def test_train_step_decreases_loss():
    tr = _tiny_trainer(MixSDE(), init_hack=0, train_source_order="power",
                       lr=1e-3)
    params, mix, tgt = _init(tr)
    state = tr.init_state(params)
    step = jax.jit(tr.train_step)
    losses = []
    for i in range(8):
        state, metrics = step(state, jax.random.PRNGKey(i), (mix, tgt))
        losses.append(float(metrics["train/score_loss"]))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_ema_tracks_params():
    tr = _tiny_trainer(MixSDE(), ema_decay=0.5, init_hack=0)
    params, mix, tgt = _init(tr)
    state = tr.init_state(params)
    state2, _ = jax.jit(tr.train_step)(state, jax.random.PRNGKey(0),
                                       (mix, tgt))
    # ema moved halfway between old and new params
    p_old = jax.tree.leaves(state.params)[0]
    p_new = jax.tree.leaves(state2.params)[0]
    e_new = jax.tree.leaves(state2.ema_params)[0]
    np.testing.assert_allclose(
        np.asarray(e_new), np.asarray(0.5 * p_old + 0.5 * p_new), atol=1e-6)


def test_separate_shapes_and_metrics():
    tr = _tiny_trainer(MixSDE())
    params, mix, tgt = _init(tr)
    est, nfe = jax.jit(
        lambda p, k, m: tr.separate(p, k, m, N=3)
    )(params, jax.random.PRNGKey(0), mix)
    assert est.shape == tgt.shape
    assert nfe == 6
    m = tr.val_separation_metrics(params, jax.random.PRNGKey(1),
                                  (mix, tgt), N=2)
    assert np.isfinite(float(m["val/si_sdr"]))


def test_train_step_sharded_over_mesh():
    """The same train_step runs under shard_map-free pjit with the batch
    sharded over an 8-device data axis."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(np.array(devs).reshape(8), ("data",))
    tr = _tiny_trainer(MixSDE(), init_hack=5)
    params, mix, tgt = _init(tr, t_len=2000, batch=8)
    state = tr.init_state(params)

    batch_sharding = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    mix = jax.device_put(mix, batch_sharding)
    tgt = jax.device_put(tgt, batch_sharding)
    state = jax.device_put(state, repl)

    step = jax.jit(
        tr.train_step,
        in_shardings=(repl, repl, (batch_sharding, batch_sharding)),
        out_shardings=(repl, repl),
    )
    state2, metrics = step(state, jax.random.PRNGKey(0), (mix, tgt))
    assert np.isfinite(float(metrics["train/score_loss"]))
    assert int(state2.step) == 1


# ------------------------------------------------------------ init hack 4 --
def test_init_hack_4_matrix_sde_finite():
    """Noise-reduction family: PriorMixSDE + hack 4
    (reference: src/config/diffsep/model/nr.yaml, src/diffsep.py:160-175)."""
    from ditsep_tpu.sdes import PriorMixSDE
    tr = _tiny_trainer(PriorMixSDE(sigma_min=0.05, sigma_max=0.5),
                       init_hack=4, train_source_order=None)
    params, mix, tgt = _init(tr)
    loss = tr.training_loss(params, jax.random.PRNGKey(1), mix, tgt)
    assert np.isfinite(float(loss))


def test_init_hack_4_scalar_sde_is_noop():
    """The reference's DiffSepOU.sample_prior has no hack branch
    (src/diffsep.py:799-811), so init_hack=4 on a scalar SDE must be a
    no-op — identical loss to init_hack=0 under the same key."""
    t4 = _tiny_trainer(OUVESDE(), init_hack=4, train_source_order=None)
    t0 = _tiny_trainer(OUVESDE(), init_hack=0, train_source_order=None)
    params, mix, tgt = _init(t4)
    k = jax.random.PRNGKey(2)
    l4 = t4.training_loss(params, k, mix, tgt)
    l0 = t0.training_loss(params, k, mix, tgt)
    np.testing.assert_allclose(np.asarray(l4), np.asarray(l0))


def test_init_hack_4_clamps_to_anchor():
    """With sde.N=1 every sample is clamped to t=T with the anchor mean:
    x_t = mix/n + L z exactly, so the redefined noise must satisfy
    mean + L z_mod == anchor + L z (reference: src/diffsep.py:161-176)."""
    from ditsep_tpu.sdes import MixSDE
    sde = MixSDE(N=1)
    tr = _tiny_trainer(sde, init_hack=4, train_source_order=None)
    params, mix, tgt = _init(tr)
    # reproduce the trainer's internal sampling to check the identity
    key = jax.random.PRNGKey(3)
    _, k_z, _ = jax.random.split(key, 3)
    time = jnp.full((tgt.shape[0],), sde.T, dtype=tgt.dtype)
    mean, L = tr._marginal(tgt, time, mix)
    z = jax.random.normal(k_z, tgt.shape, dtype=tgt.dtype)
    anchor = tr._anchor(mix, tgt.shape)
    z_mod = z + sde.mult_std_inv(L, anchor - mean)
    lhs = mean + sde.mult_std(L, z_mod)
    rhs = anchor + sde.mult_std(L, z)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               atol=1e-4, rtol=1e-4)
