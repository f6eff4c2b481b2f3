"""SDE closed-form tests.

Oracles are dense-matrix computations built directly in the tests from the
published formulas (mean mixing matrix A + e^{-lambda t} Pn, covariance
eigenvalues, etc.), verifying that the projector-form fast path used on TPU
matches the dense linear algebra of the reference design
(reference: src/sdes/sdes.py:182-779).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ditsep_tpu.sdes import (
    MixSDE,
    OUVESDE,
    PriorMixSDE,
    SBVESDE,
    SDERegistry,
    pc_sample,
    ode_sample,
    sb_sample,
)


def dense_mix_mats(ndim):
    ones = np.ones((ndim, 1))
    A = ones @ ones.T / ndim
    Pn = np.eye(ndim) - A
    return A, Pn


class TestMixSDE:
    sde = MixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05, sigma_max=0.5, N=30)

    def test_registry(self):
        assert SDERegistry.get_by_name("mix") is MixSDE
        assert SDERegistry.get_by_name("priormix") is PriorMixSDE
        assert SDERegistry.get_by_name("ouve") is OUVESDE
        assert SDERegistry.get_by_name("sbve") is SBVESDE

    def test_mean_matches_dense(self):
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=(4, 2, 64)).astype(np.float32)
        t = rng.uniform(0.03, 1.0, size=(4,)).astype(np.float32)
        A, Pn = dense_mix_mats(2)
        want = np.stack(
            [(A + math.exp(-2.0 * ti) * Pn) @ xi for xi, ti in zip(x0, t)]
        )
        got = self.sde.mean(jnp.asarray(x0), jnp.asarray(t))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_cov_eigvals_closed_form(self):
        t = np.linspace(0.03, 1.0, 7).astype(np.float32)
        s_min, s_max, lam = 0.05, 0.5, 2.0
        r = s_max / s_min
        logsig = math.log(r)
        ev1_want = s_min**2 * (r ** (2 * t) - 1)
        ev2_want = (
            s_min**2 * (r ** (2 * t) - np.exp(-2 * lam * t)) / (1 + lam / logsig)
        )
        ev1, ev2 = self.sde.cov_eigval(jnp.asarray(t))
        np.testing.assert_allclose(ev1, ev1_want, rtol=1e-5)
        np.testing.assert_allclose(ev2, ev2_want, rtol=1e-5)

    def test_mult_std_matches_dense_matrix(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(3, 2, 32)).astype(np.float32)
        t = rng.uniform(0.1, 1.0, size=(3,)).astype(np.float32)
        std = self.sde.std(jnp.asarray(t), 3)
        got = self.sde.mult_std(std, jnp.asarray(x))

        A, Pn = dense_mix_mats(2)
        ev1, ev2 = self.sde.cov_eigval(jnp.asarray(t))
        want = np.stack(
            [
                (math.sqrt(e1) * A + math.sqrt(e2) * Pn) @ xi
                for xi, e1, e2 in zip(x, np.asarray(ev1), np.asarray(ev2))
            ]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_mult_std_inv_is_inverse(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(3, 2, 32)).astype(np.float32))
        t = jnp.asarray(rng.uniform(0.1, 1.0, size=(3,)).astype(np.float32))
        std = self.sde.std(t, 3)
        back = self.sde.mult_std_inv(std, self.sde.mult_std(std, x))
        np.testing.assert_allclose(back, x, rtol=1e-4, atol=1e-5)

    def test_3_speaker_roundtrip(self):
        sde3 = MixSDE(ndim=3)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 3, 16)).astype(np.float32))
        t = jnp.asarray([0.5, 0.9], dtype=jnp.float32)
        mean, std = sde3.marginal_prob(x, t)
        A, Pn = dense_mix_mats(3)
        ev1, ev2 = sde3.cov_eigval(t)
        want = np.stack(
            [
                (math.sqrt(e1) * A + math.sqrt(e2) * Pn) @ xi
                for xi, e1, e2 in zip(np.asarray(x), np.asarray(ev1), np.asarray(ev2))
            ]
        )
        np.testing.assert_allclose(sde3.mult_std(std, x), want, rtol=1e-5, atol=1e-6)

    def test_prior_sampling_stats(self):
        key = jax.random.PRNGKey(0)
        mix = jnp.ones((512, 1, 128), dtype=jnp.float32)
        x_T = self.sde.prior_sampling(key, (512, 2, 128), mix)
        # mean should be mix / ndim = 0.5
        assert abs(float(x_T.mean()) - 0.5) < 2e-2
        # total variance should be var(T) per component
        var_want = float(self.sde.var(jnp.asarray([1.0]))[0])
        var_got = float(x_T.var())
        assert abs(var_got - var_want) / var_want < 0.1

    def test_varprop_time_sampling(self):
        key = jax.random.PRNGKey(0)
        t = self.sde.sample_time_varprop(key, 4096, t_eps=0.03)
        assert t.shape == (4096,)
        assert float(t.min()) >= 0.03 and float(t.max()) <= 1.0
        # density ~ std(t), increasing in t => mean > uniform midpoint
        assert float(t.mean()) > 0.55

    def test_drift_diffusion(self):
        x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 2, 8)),
                        dtype=jnp.float32)
        t = jnp.asarray([0.2, 0.8], dtype=jnp.float32)
        drift, diff = self.sde.drift_diffusion(x, t)
        A, Pn = dense_mix_mats(2)
        want = np.stack([-2.0 * Pn @ xi for xi in np.asarray(x)])
        np.testing.assert_allclose(drift, want, rtol=1e-5, atol=1e-6)
        sig_want = 0.05 * (10.0 ** np.asarray(t)) * math.sqrt(2 * math.log(10.0))
        np.testing.assert_allclose(diff, sig_want, rtol=1e-5)


class TestPriorMixSDE:
    sde = PriorMixSDE(ndim=2, d_lambda=2.0, sigma_min=0.05, sigma_max=0.5,
                      N=30, avg_len=510)

    def test_sigma_mix_matches_torch_avgpool(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(5)
        mix = rng.normal(size=(2, 1, 2000)).astype(np.float32)
        got = self.sde.sigma_mix(jnp.asarray(mix))
        tm = torch.from_numpy(mix)
        want = torch.nn.functional.avg_pool1d(
            tm**2, kernel_size=510, stride=1, padding=255
        )
        want = want.clamp(min=1e-4).sqrt()[..., :-1] * 0.5
        np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-6)

    def test_mult_std_inv_matches_2x2_solve(self):
        rng = np.random.default_rng(6)
        mix = jnp.asarray(rng.normal(size=(2, 1, 600)).astype(np.float32))
        x = jnp.asarray(rng.normal(size=(2, 2, 600)).astype(np.float32))
        t = jnp.asarray([0.4, 0.9], dtype=jnp.float32)
        std = self.sde.std(t, mix, 3)
        y = self.sde.mult_std(std, x)
        back = self.sde.mult_std_inv(std, y)
        np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)

        # dense oracle: L[b,:,:,s] = (sqrt(ev1) A + sqrt(ev2) Pn) * sig[b,0,s]
        A, Pn = dense_mix_mats(2)
        ev1, ev2 = self.sde.cov_eigval(t)
        sig = np.asarray(self.sde.sigma_mix(mix))
        want = np.empty_like(np.asarray(x))
        for b in range(2):
            L = (
                math.sqrt(float(ev1[b])) * A + math.sqrt(float(ev2[b])) * Pn
            )  # (2,2)
            for s in range(x.shape[-1]):
                want[b, :, s] = (L * sig[b, 0, s]) @ np.asarray(x)[b, :, s]
        np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)

    def test_prior_sampling_shapes(self):
        key = jax.random.PRNGKey(1)
        mix = jnp.ones((3, 1, 700), dtype=jnp.float32)
        x = self.sde.prior_sampling(key, (3, 2, 700), mix)
        assert x.shape == (3, 2, 700)
        assert bool(jnp.isfinite(x).all())


class TestOUVESDE:
    sde = OUVESDE(theta=1.5, sigma_min=0.05, sigma_max=0.5)

    def test_mean_std_closed_form(self):
        rng = np.random.default_rng(7)
        x0 = rng.normal(size=(3, 2, 50)).astype(np.float32)
        y = rng.normal(size=(3, 1, 50)).astype(np.float32)
        t = np.asarray([0.1, 0.5, 0.9], dtype=np.float32)
        mean, std = self.sde.marginal_prob(
            jnp.asarray(x0), jnp.asarray(t), jnp.asarray(y)
        )
        e = np.exp(-1.5 * t)[:, None, None]
        np.testing.assert_allclose(mean, e * x0 + (1 - e) * y, rtol=1e-4, atol=1e-5)

        theta, logsig, s_min = 1.5, math.log(10.0), 0.05
        std_want = np.sqrt(
            s_min**2 * np.exp(-2 * theta * t)
            * (np.exp(2 * (theta + logsig) * t) - 1) * logsig / (theta + logsig)
        )
        np.testing.assert_allclose(std, std_want, rtol=1e-5)

    def test_std_is_consistent_with_sde_integral(self):
        # Var(t) = int_0^t e^{-2 theta (t-s)} g(s)^2 ds  (numerically)
        t_end = 0.7
        s = np.linspace(0, t_end, 20001)
        g = 0.05 * (10.0**s) * math.sqrt(2 * math.log(10.0))
        integrand = np.exp(-2 * 1.5 * (t_end - s)) * g**2
        var_num = np.trapezoid(integrand, s)
        std = float(self.sde.std(jnp.asarray([t_end]))[0])
        assert abs(std**2 - var_num) / var_num < 1e-3

    def test_prior_sampling(self):
        key = jax.random.PRNGKey(2)
        y = jnp.zeros((64, 1, 256), dtype=jnp.float32)
        x = self.sde.prior_sampling(key, (64, 2, 256), y)
        assert x.shape == (64, 2, 256)
        std_want = float(self.sde.std(jnp.ones((1,)))[0])
        assert abs(float(x.std()) - std_want) / std_want < 0.05


class TestSBVESDE:
    sde = SBVESDE(k=2.6, c=0.4, N=50)

    def test_sigma_schedule(self):
        t = np.asarray([0.25, 0.75, 1.0], dtype=np.float32)
        k, c = 2.6, 0.4
        sig_want = np.sqrt(c * (k ** (2 * t) - 1) / (2 * math.log(k)))
        sigma_t, sigma_T, sigma_bart, a_t, a_T, a_bart = self.sde.sigmas_alphas(
            jnp.asarray(t)
        )
        np.testing.assert_allclose(sigma_t, sig_want, rtol=1e-5)
        np.testing.assert_allclose(
            sigma_T, np.full_like(t, sig_want[-1]), rtol=1e-5
        )

    def test_mean_weights_sum_to_one_at_boundaries(self):
        # at t=0: mean ~ x0 ; at t=T: mean ~ y
        x0 = jnp.ones((1, 2, 8))
        y = jnp.full((1, 2, 8), 5.0)
        m0 = self.sde.mean(x0, jnp.asarray([1e-6]), y)
        mT = self.sde.mean(x0, jnp.asarray([1.0]), y)
        np.testing.assert_allclose(m0, x0, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(mT, y, rtol=1e-3, atol=1e-3)

    def test_prior_is_y(self):
        y = jnp.full((2, 2, 8), 3.0)
        x = self.sde.prior_sampling(jax.random.PRNGKey(0), (2, 2, 8), y)
        np.testing.assert_allclose(x, y)


def _zero_score(x, t, y):
    return jnp.zeros_like(x)


def _pull_to_zero_score(x, t, y):
    return -x


class TestSamplers:
    def test_pc_sampler_runs_and_is_deterministic(self):
        sde = MixSDE(N=5)
        key = jax.random.PRNGKey(42)
        y = jnp.ones((2, 1, 64), dtype=jnp.float32)
        x1, nfe = pc_sample(sde, _zero_score, key, y, N=5, snr=0.5,
                            corrector_steps=1)
        x2, _ = pc_sample(sde, _zero_score, key, y, N=5, snr=0.5,
                          corrector_steps=1)
        assert x1.shape == (2, 2, 64)
        assert nfe == 10
        np.testing.assert_allclose(x1, x2)

    def test_pc_sampler_jit(self):
        sde = MixSDE(N=4)
        f = jax.jit(
            lambda key, y: pc_sample(sde, _pull_to_zero_score, key, y)[0]
        )
        y = jnp.ones((1, 1, 32), dtype=jnp.float32)
        out = f(jax.random.PRNGKey(0), y)
        assert out.shape == (1, 2, 32)
        assert bool(jnp.isfinite(out).all())

    def test_pc_sampler_ouve_ald(self):
        sde = OUVESDE(N=4)
        y = jnp.ones((2, 1, 32), dtype=jnp.float32)
        x, nfe = pc_sample(
            sde, _pull_to_zero_score, jax.random.PRNGKey(1), y,
            predictor="reverse_diffusion", corrector="ald",
        )
        assert x.shape == (2, 2, 32)
        assert bool(jnp.isfinite(x).all())

    def test_pc_scheduled_grids(self):
        sde = OUVESDE(N=4)
        y = jnp.ones((1, 1, 32), dtype=jnp.float32)
        for schedule in ["linear", "log", "revlog"]:
            x, _ = pc_sample(
                sde, _zero_score, jax.random.PRNGKey(0), y,
                corrector="ald", schedule=schedule,
            )
            assert bool(jnp.isfinite(x).all())

    def test_intermediate_trajectory(self):
        sde = MixSDE(N=3)
        y = jnp.ones((1, 1, 16), dtype=jnp.float32)
        x, nfe, traj = pc_sample(
            sde, _zero_score, jax.random.PRNGKey(0), y, intermediate=True
        )
        xs, x_means = traj
        assert xs.shape == (3, 1, 2, 16)

    def test_ode_sampler(self):
        sde = OUVESDE(N=8)
        y = jnp.ones((1, 2, 32), dtype=jnp.float32)
        x, nfe = ode_sample(sde, _pull_to_zero_score, jax.random.PRNGKey(0), y)
        assert x.shape == (1, 2, 32)
        assert nfe == 8 * 4 + 1
        assert bool(jnp.isfinite(x).all())

    def test_sb_sampler_both_types(self):
        sde = SBVESDE(N=6)
        y = jnp.ones((2, 1, 32), dtype=jnp.float32)
        for st in ["ode", "sde"]:
            x, n = sb_sample(
                sde, _zero_score, jax.random.PRNGKey(0), y, sampler_type=st
            )
            assert x.shape == (2, 2, 32)
            assert bool(jnp.isfinite(x).all())

    def test_mix_sampler_conserves_mixture(self):
        """With the true score of the MixSDE prior the sample average over
        sources should stay close to the scaled mixture (A-subspace is
        untouched by the drift)."""
        sde = MixSDE(N=30)
        key = jax.random.PRNGKey(3)
        y = jnp.ones((1, 1, 64), dtype=jnp.float32)
        x, _ = pc_sample(sde, _zero_score, key, y, denoise=True)
        avg = x.mean(axis=1)
        # average of sources should be ~ y/2 * 2 = mixture mean each = 0.5
        assert abs(float(avg.mean()) - 0.5) < 0.25
