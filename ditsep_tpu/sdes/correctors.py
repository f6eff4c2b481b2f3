"""Corrector (Langevin MCMC) steps for PC sampling.

Pure step functions (reference: src/sdes/correctors.py:35-134). `n_steps` is
a static Python int -- the inner loop is unrolled (it is 1 in every shipped
config), keeping the jitted graph simple.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ditsep_tpu.sdes.core import BaseSDE, bcast_right
from ditsep_tpu.utils.registry import Registry

CorrectorRegistry = Registry("Corrector")


@CorrectorRegistry.register("langevin")
def langevin_corrector(sde: BaseSDE, score_fn, x, t, cond, key,
                       snr: float = 0.1, n_steps: int = 1, noises=None):
    """Langevin MCMC with SNR-matched step size
    (reference: src/sdes/correctors.py:35-55). ``noises`` (n_steps,
    *x.shape) overrides the PRNG draws (parity testing)."""
    x_mean = x
    for i in range(n_steps):
        k_noise, key = jax.random.split(key)
        grad = score_fn(x, t, cond)
        noise = (jax.random.normal(k_noise, x.shape, dtype=x.dtype)
                 if noises is None else noises[i])
        grad_norm = jnp.mean(
            jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1)
        )
        noise_norm = jnp.mean(
            jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1)
        )
        step_size = (snr * noise_norm / grad_norm) ** 2 * 2.0
        x_mean = x + step_size * grad
        x = x_mean + noise * jnp.sqrt(step_size * 2.0)
    return x, x_mean


@CorrectorRegistry.register("ald")
def ald_corrector(sde: BaseSDE, score_fn, x, t, cond, key,
                  snr: float = 0.1, n_steps: int = 1, noises=None):
    """Annealed Langevin dynamics with scalar std step size
    (reference: src/sdes/correctors.py:58-84)."""
    x_mean = x
    _, std = sde.marginal_prob(x, t, cond)
    s = bcast_right(sde.std_scalar(std), x.ndim)
    for i in range(n_steps):
        k_noise, key = jax.random.split(key)
        grad = score_fn(x, t, cond)
        noise = (jax.random.normal(k_noise, x.shape, dtype=x.dtype)
                 if noises is None else noises[i])
        step_size = (snr * s) ** 2 * 2.0
        x_mean = x + step_size * grad
        x = x_mean + noise * jnp.sqrt(step_size * 2.0)
    return x, x_mean


@CorrectorRegistry.register("ald2")
def ald2_corrector(sde: BaseSDE, score_fn, x, t, cond, key,
                   snr: float = 0.1, n_steps: int = 1, noises=None):
    """Matrix annealed Langevin dynamics for Mix SDEs: the score is
    preconditioned by L L (covariance sqrt applied twice) and the noise by
    2*snr*L (reference: src/sdes/correctors.py:87-121). Thanks to the eigen
    form of L this is all elementwise math on TPU.
    """
    x_mean = x
    _, L = sde.marginal_prob(x, t, cond)
    for i in range(n_steps):
        k_noise, key = jax.random.split(key)
        grad = score_fn(x, t, cond)
        noise = (jax.random.normal(k_noise, x.shape, dtype=x.dtype)
                 if noises is None else noises[i])
        step_size = 2.0 * snr ** 2
        grad = sde.mult_std(L, grad)
        grad = sde.mult_std(L, grad)
        x_mean = x + step_size * grad
        x = x_mean + 2.0 * snr * sde.mult_std(L, noise)
    return x, x_mean


@CorrectorRegistry.register("none")
def none_corrector(sde, score_fn, x, t, cond, key, snr=0.0,
                   n_steps: int = 0, noises=None):
    del sde, score_fn, t, cond, key, snr, n_steps, noises
    return x, x
