"""SDE library: forward SDEs with closed-form perturbation kernels.

Pure-functional JAX re-design of the reference SDE layer
(reference: src/sdes/sdes.py:44-779). Each SDE is a frozen dataclass of
static hyperparameters; every method is a pure function of arrays, so SDEs
can be closed over by jitted samplers and train steps.

TPU-first design notes
----------------------
* The reference represents the MixSDE perturbation std as a dense (n, n)
  matrix and inverts it with ``torch.linalg.solve`` inside the sampling loop
  (reference: src/sdes/sdes.py:317-334). Here the matrix square root
  ``L = sqrt(ev1) * A + sqrt(ev2) * Pn`` is kept in *eigen form*
  (:class:`MixStd`), because A (the source-averaging projector) and
  Pn = I - A are fixed orthogonal projectors:

      L @ x        = a * mean(x) + b * (x - mean(x))
      L^{-1} @ x   = mean(x) / a + (x - mean(x)) / b

  This removes every matmul/solve from the hot sampling loop -- it is pure
  VPU elementwise work that XLA fuses into neighbouring ops.
* Time-dependent scalars are computed on (batch,)-shaped ``t`` and
  broadcast right; all shapes are static under jit.
* Randomness is explicit: every sampling function takes a PRNG key.
"""
from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from ditsep_tpu.utils.registry import Registry

SDERegistry = Registry("SDE")

Array = jax.Array


def bcast_right(a: Array, ndim: int) -> Array:
    """Append trailing singleton dims to `a` until it has `ndim` dims."""
    if a.ndim > ndim:
        raise ValueError(f"cannot broadcast {a.shape} to ndim {ndim}")
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


class MixStd(NamedTuple):
    """Eigen-form matrix std for :class:`MixSDE`.

    Represents ``L = a * A + b * Pn`` where A = 11^T/n is the averaging
    projector over the source axis (axis=1) and Pn = I - A.

    a, b: (batch, 1, ...) arrays (eigenvalue square roots), broadcastable
    against the state.
    """

    a: Array
    b: Array


class PriorMixStd(NamedTuple):
    """Eigen-form matrix std for :class:`PriorMixSDE`:
    ``L = (a * A + b * Pn) * diag(sig)`` with per-(sample, time) scale sig.
    """

    a: Array
    b: Array
    sig: Array  # (batch, 1, n_samples) signal-adaptive scale


Std = Union[Array, MixStd, PriorMixStd]


def _src_mean(x: Array) -> Array:
    """Mean over the source axis (axis=1), kept for broadcasting."""
    return jnp.mean(x, axis=1, keepdims=True)


def mix_mult(a: Array, b: Array, x: Array) -> Array:
    """(a A + b Pn) @ x using projector identities (no matmul)."""
    m = _src_mean(x)
    return a * m + b * (x - m)


def mix_mult_inv(a: Array, b: Array, x: Array) -> Array:
    """(a A + b Pn)^{-1} @ x = (1/a) A x + (1/b) Pn x."""
    m = _src_mean(x)
    return m / a + (x - m) / b


@dataclasses.dataclass(frozen=True)
class BaseSDE:
    """Shared interface. Subclasses define drift/diffusion and the closed-form
    perturbation kernel (marginal_prob)."""

    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    # --- std algebra (overridden by matrix SDEs) ---------------------------
    def mult_std(self, std: Std, x: Array) -> Array:
        return bcast_right(std, x.ndim) * x

    def mult_std_inv(self, std: Std, x: Array) -> Array:
        return x / bcast_right(std, x.ndim)

    def std_scalar(self, std: Std) -> Array:
        """A (batch,)-broadcastable scalar view of the std, used by scalar
        correctors (`ald`) that need one step size per sample."""
        return std

    # --- Euler-Maruyama discretization --------------------------------------
    def discretize(self, x: Array, t: Array, cond: Array, dt=None):
        """One forward EM step: x_{i+1} = x_i + f_i(x_i) + G_i z_i.

        Mirrors reference src/sdes/sdes.py:94-108. Note: the reference's
        ``getattr(kwargs, "dt", 1/N)`` never reads the dict, so dt is
        effectively always 1/N there; we honour an explicit dt but default
        to the same 1/N.
        """
        if dt is None:
            dt = 1.0 / self.N
        drift, diffusion = self.drift_diffusion(x, t, cond)
        f = drift * dt
        G = diffusion * jnp.sqrt(jnp.asarray(dt, x.dtype))
        return f, G

    def reverse_discretize(self, score_fn, x, t, cond, dt=None,
                           probability_flow: bool = False):
        """Discretized reverse-SDE step parts (reference: sdes.py:165-173)."""
        f, G = self.discretize(x, t, cond, dt=dt)
        score = score_fn(x, t, cond)
        G_b = bcast_right(G, x.ndim)
        rev_f = f - G_b ** 2 * score * (0.5 if probability_flow else 1.0)
        rev_G = jnp.zeros_like(G) if probability_flow else G
        return rev_f, rev_G

    def reverse_drift_diffusion(self, score_fn, x, t, cond,
                                probability_flow: bool = False):
        """Continuous reverse-time drift/diffusion (reference: sdes.py:131-163)."""
        drift, diffusion = self.drift_diffusion(x, t, cond)
        score = score_fn(x, t, cond)
        d_b = bcast_right(diffusion, x.ndim)
        score_drift = -d_b ** 2 * score * (0.5 if probability_flow else 1.0)
        total_drift = drift + score_drift
        rev_diffusion = (
            jnp.zeros_like(diffusion) if probability_flow else diffusion
        )
        return total_drift, rev_diffusion


@SDERegistry.register("mix")
@dataclasses.dataclass(frozen=True)
class MixSDE(BaseSDE):
    """Separation SDE ``dx = -lambda Pn x dt + g(t) dw`` in the source space.

    g(t) = sigma_min * (sigma_max/sigma_min)^t * sqrt(2 log(sigma_max/sigma_min)).

    Closed forms (reference: src/sdes/sdes.py:182-351):
      mean(t)   = (A + exp(-lambda t) Pn) x0
      cov eig   : ev1 = s_min^2 (r^{2t} - 1)                 (A subspace)
                  ev2 = s_min^2 (r^{2t} - e^{-2 lambda t}) / (1 + lambda/log r)
      std       = sqrt(ev1) A + sqrt(ev2) Pn
    """

    ndim: int = 2
    d_lambda: float = 2.0
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 30

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    @property
    def ratiosig(self) -> float:
        return self.sigma_max / self.sigma_min

    def drift_diffusion(self, x: Array, t: Array, cond=None):
        m = _src_mean(x)
        drift = -self.d_lambda * (x - m)  # -lambda * Pn x
        sigma = self.sigma_min * self.ratiosig ** t
        diffusion = sigma * math.sqrt(2.0 * self.logsig)
        return drift, diffusion

    def _mean_coeffs(self, t: Array) -> Array:
        return jnp.exp(-t * self.d_lambda)

    def mean(self, x0: Array, t: Array) -> Array:
        decay = bcast_right(self._mean_coeffs(t), x0.ndim)
        m = _src_mean(x0)
        return m + decay * (x0 - m)

    def cov_eigval(self, t: Array) -> Tuple[Array, Array]:
        mult = self.sigma_min ** 2
        s_ratio_power = self.ratiosig ** (2.0 * t)
        ev1 = mult * (s_ratio_power - 1.0)
        exponential = jnp.exp(-2.0 * self.d_lambda * t)
        denom = 1.0 + self.d_lambda / self.logsig
        ev2 = mult * (s_ratio_power - exponential) / denom
        return ev1, ev2

    def var(self, t: Array) -> Array:
        """Per-component marginal variance of (sqrt(ev1) A + sqrt(ev2) Pn) z:
        diag(ev1 A + ev2 Pn) = ev1/n + ev2 (n-1)/n. The reference hardcodes
        the n=2 weights 0.5/0.5 (src/sdes/sdes.py:313-315) although ndim is
        configurable; we use the general weights (identical for n=2)."""
        ev1, ev2 = self.cov_eigval(t)
        n = self.ndim
        return ev1 / n + ev2 * (n - 1) / n

    def std(self, t: Array, state_ndim: int = 3) -> MixStd:
        ev1, ev2 = self.cov_eigval(t)
        a = bcast_right(jnp.sqrt(ev1), state_ndim)
        b = bcast_right(jnp.sqrt(ev2), state_ndim)
        return MixStd(a, b)

    def marginal_prob(self, x0: Array, t: Array, cond=None):
        return self.mean(x0, t), self.std(t, x0.ndim)

    def mult_std(self, std: MixStd, x: Array) -> Array:
        return mix_mult(std.a, std.b, x)

    def mult_std_inv(self, std: MixStd, x: Array) -> Array:
        return mix_mult_inv(std.a, std.b, x)

    def std_scalar(self, std: MixStd) -> Array:
        # sqrt of the per-component marginal variance (see `var`)
        n = self.ndim
        return jnp.sqrt(std.a ** 2 / n + std.b ** 2 * (n - 1) / n)

    def prior_sampling(self, key: Array, shape: Tuple[int, ...], mix: Array):
        """x_T ~ N(broadcast(mix / n), Sigma(T)). `mix` is (B, 1, T) or
        (B, n, T) (reference: src/sdes/sdes.py:336-348 uses 0.5*y for n=2)."""
        z = jax.random.normal(key, shape, dtype=mix.dtype)
        return self.prior_from_noise(z, shape, mix)

    def prior_from_noise(self, z: Array, shape: Tuple[int, ...], mix: Array):
        """Prior sample from an explicit standard-normal draw `z`
        (deterministic-noise path for reproducibility/parity tests)."""
        b = mix.shape[0]
        t = jnp.full((b,), self.T, dtype=mix.dtype)
        std = self.std(t, len(shape))
        mean = jnp.broadcast_to(mix / self.ndim, shape)
        return mean + self.mult_std(std, z)

    def sample_time_varprop(self, key: Array, n: int, t_eps: float = 0.0,
                            oversample: int = 8) -> Array:
        """Sample t in [t_eps, T] with density proportional to the noise std.

        The reference uses a Python rejection loop (src/sdes/sdes.py:261-275);
        here we draw a static `oversample*n` batch of proposals, accept/reject
        vectorized, and fill any (exponentially unlikely) shortfall with the
        uniform proposals themselves.
        """
        m = oversample * n
        k1, k2 = jax.random.split(key)
        t = jax.random.uniform(k1, (m,), minval=t_eps, maxval=self.T)
        l_max = jnp.sqrt(self.var(jnp.asarray([self.T])))[0]
        u = jax.random.uniform(k2, (m,), minval=0.0, maxval=l_max)
        acc = u < jnp.sqrt(self.var(t))
        # stable partition: accepted first, preserving order; rejected after
        order = jnp.argsort(~acc, stable=True)
        return t[order[:n]]


@SDERegistry.register("priormix")
@dataclasses.dataclass(frozen=True)
class PriorMixSDE(MixSDE):
    """MixSDE with signal-adaptive noise: the std is scaled per (sample, time)
    by a sliding RMS of the mixture power (reference: src/sdes/sdes.py:354-592).
    """

    avg_len: int = 510

    def sigma_mix(self, mix: Array) -> Array:
        """0.5 * sqrt(clamp(avgpool(mix^2, k=avg_len, stride=1, pad=k//2), 1e-4)).

        Matches torch.nn.functional.avg_pool1d with count_include_pad=True;
        for even avg_len the final extra frame is dropped
        (reference: src/sdes/sdes.py:479-491).
        """
        k = self.avg_len
        pad = k // 2
        p2 = jnp.pad(mix ** 2, [(0, 0)] * (mix.ndim - 1) + [(pad, pad)])
        # sliding window mean via cumulative sum: O(T), fully fusable
        cs = jnp.cumsum(p2, axis=-1)
        cs = jnp.pad(cs, [(0, 0)] * (mix.ndim - 1) + [(1, 0)])
        win = (cs[..., k:] - cs[..., :-k]) / k
        if k % 2 == 0:
            win = win[..., : mix.shape[-1]]
        sig = jnp.sqrt(jnp.clip(win, min=1e-4))
        return 0.5 * sig

    def std(self, t: Array, mix: Array, state_ndim: int = 3) -> PriorMixStd:  # type: ignore[override]
        ev1, ev2 = self.cov_eigval(t)
        a = bcast_right(jnp.sqrt(ev1), state_ndim)
        b = bcast_right(jnp.sqrt(ev2), state_ndim)
        return PriorMixStd(a, b, self.sigma_mix(mix))

    def drift_diffusion(self, x: Array, t: Array, mix: Array):
        m = _src_mean(x)
        drift = -self.d_lambda * (x - m)
        sig = jnp.broadcast_to(
            self.sigma_mix(mix), (x.shape[0], self.ndim, x.shape[-1])
        )
        sigma = self.sigma_min * self.ratiosig ** t
        diffusion = bcast_right(sigma, sig.ndim) * math.sqrt(2 * self.logsig) * sig
        return drift, diffusion

    def marginal_prob(self, x0: Array, t: Array, mix: Array):
        return self.mean(x0, t), self.std(t, mix, x0.ndim)

    def mult_std(self, std: PriorMixStd, x: Array) -> Array:
        # L = (a A + b Pn) @ diag(sig): scale FIRST, then mix (the
        # reference scales L's columns, src/sdes/sdes.py:528-534); the
        # order only matters when sig differs across source channels
        return mix_mult(std.a, std.b, std.sig * x)

    def mult_std_inv(self, std: PriorMixStd, x: Array) -> Array:
        return mix_mult_inv(std.a, std.b, x) / std.sig

    def std_scalar(self, std: PriorMixStd) -> Array:
        n = self.ndim
        return jnp.sqrt(std.a ** 2 / n
                        + std.b ** 2 * (n - 1) / n) * std.sig

    def prior_sampling(self, key: Array, shape: Tuple[int, ...], mix: Array):
        z = jax.random.normal(key, shape, dtype=mix.dtype)
        return self.prior_from_noise(z, shape, mix)

    def prior_from_noise(self, z: Array, shape: Tuple[int, ...], mix: Array):
        """Reference quirk reproduced: when ``mix`` already carries ndim
        channels the prior mean is the UNSCALED mix per source (reference
        PriorMixSDE.prior_sampling, src/sdes/sdes.py:222-223 ``mean =
        mix``), unlike the (B,1,T) layout's mix/ndim -- the two layouts
        intentionally disagree exactly as the reference's do."""
        b = mix.shape[0]
        t = jnp.full((b,), self.T, dtype=mix.dtype)
        std = self.std(t, mix, len(shape))
        if mix.shape[1] == self.ndim:
            mean = mix
        else:
            mean = jnp.broadcast_to(mix / self.ndim, shape)
        return mean + self.mult_std(std, z)


@SDERegistry.register("ouve")
@dataclasses.dataclass(frozen=True)
class OUVESDE(BaseSDE):
    """Ornstein-Uhlenbeck variance-exploding SDE
    ``dx = theta (y - x) dt + g(t) dw`` (reference: src/sdes/sdes.py:595-698).

    mean(t) = e^{-theta t} x0 + (1 - e^{-theta t}) y
    std(t)  = sqrt(s_min^2 e^{-2 theta t} (e^{2(theta+logsig)t} - 1)
                   * logsig / (theta + logsig))
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 1000

    @property
    def logsig(self) -> float:
        return math.log(self.sigma_max / self.sigma_min)

    def drift_diffusion(self, x: Array, t: Array, y: Array):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * math.sqrt(2.0 * self.logsig)
        return drift, diffusion

    def mean(self, x0: Array, t: Array, y: Array) -> Array:
        e = bcast_right(jnp.exp(-self.theta * t), x0.ndim)
        return e * x0 + (1.0 - e) * y

    def std(self, t: Array) -> Array:
        s, th, ls = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (s ** 2 * jnp.exp(-2 * th * t) * (jnp.exp(2 * (th + ls) * t) - 1) * ls)
            / (th + ls)
        )

    def var(self, t: Array) -> Array:
        return self.std(t) ** 2

    def marginal_prob(self, x0: Array, t: Array, y: Array):
        return self.mean(x0, t, y), self.std(t)

    def prior_sampling(self, key: Array, shape: Tuple[int, ...], y: Array):
        z = jax.random.normal(key, shape, dtype=y.dtype)
        return self.prior_from_noise(z, shape, y)

    def prior_from_noise(self, z: Array, shape: Tuple[int, ...], y: Array):
        b = y.shape[0]
        std = self.std(jnp.ones((b,), dtype=y.dtype))
        return jnp.broadcast_to(y, shape) + z * bcast_right(std, len(shape))


@SDERegistry.register("sbve")
@dataclasses.dataclass(frozen=True)
class SBVESDE(BaseSDE):
    """Schroedinger-Bridge VE SDE (Jukic et al. 2024)
    (reference: src/sdes/sdes.py:701-779).

    sigma_t^2 = c (k^{2t} - 1) / (2 ln k); bridge weights from Eq. (11).
    Prior is x_T = y exactly (no noise inflation).
    """

    k: float = 2.6
    c: float = 0.4
    N: int = 50
    eps: float = 1e-8
    sampler_type: str = "ode"

    def drift_diffusion(self, x: Array, t: Array, y=None):
        f = jnp.zeros_like(x)
        g = math.sqrt(self.c) * self.k ** t
        return f, g

    def sigmas_alphas(self, t: Array):
        log_k = math.log(self.k)

        def _sig(tt):
            return jnp.sqrt(self.c * (self.k ** (2 * tt) - 1.0) / (2 * log_k))

        sigma_t = _sig(t)
        # computed with the same dtype/expression as sigma_t so that
        # sigma_T^2 - sigma_t^2 is exactly 0 at t=T (no sqrt of negatives)
        sigma_T = _sig(jnp.full_like(t, self.T))
        alpha_t = jnp.ones_like(t)
        alpha_T = jnp.ones_like(t)
        alpha_bart = alpha_t / (alpha_T + self.eps)
        sigma_bart = jnp.sqrt(sigma_T ** 2 - sigma_t ** 2 + self.eps)
        return sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart

    def mean(self, x0: Array, t: Array, y: Array) -> Array:
        sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = (
            self.sigmas_alphas(t)
        )
        w_xt = alpha_t * sigma_bart ** 2 / (sigma_T ** 2 + self.eps)
        w_yt = alpha_bart * sigma_t ** 2 / (sigma_T ** 2 + self.eps)
        return bcast_right(w_xt, x0.ndim) * x0 + bcast_right(w_yt, x0.ndim) * y

    def std(self, t: Array) -> Array:
        sigma_t, sigma_T, sigma_bart, alpha_t, *_ = self.sigmas_alphas(t)
        return alpha_t * sigma_bart * sigma_t / (sigma_T + self.eps)

    def marginal_prob(self, x0: Array, t: Array, y: Array):
        return self.mean(x0, t, y), self.std(t)

    def prior_sampling(self, key: Array, shape: Tuple[int, ...], y: Array):
        del key
        return jnp.broadcast_to(y, shape)
