"""Predictor steps for reverse-SDE sampling.

Pure step functions (reference: src/sdes/predictors.py:10-77). Each takes
explicit PRNG keys and returns ``(x, x_mean)`` so the whole PC loop can live
inside one `lax.scan`.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ditsep_tpu.sdes.core import BaseSDE, bcast_right
from ditsep_tpu.utils.registry import Registry

PredictorRegistry = Registry("Predictor")


@PredictorRegistry.register("euler_maruyama")
def euler_maruyama_predictor(
    sde: BaseSDE, score_fn, x, t, cond, key, dt=None,
    probability_flow: bool = False, noise=None,
):
    """Euler-Maruyama step of the reverse SDE
    (reference: src/sdes/predictors.py:39-52). ``noise`` overrides the
    PRNG draw with an explicit standard-normal array (parity testing)."""
    if dt is None:
        dt = 1.0 / sde.N
    neg_dt = -dt
    z = (jax.random.normal(key, x.shape, dtype=x.dtype)
         if noise is None else noise)
    f, g = sde.reverse_drift_diffusion(
        score_fn, x, t, cond, probability_flow=probability_flow
    )
    x_mean = x + f * neg_dt
    g_b = bcast_right(jnp.asarray(g), x.ndim)
    x_new = x_mean + g_b * jnp.sqrt(jnp.asarray(dt, x.dtype)) * z
    return x_new, x_mean


@PredictorRegistry.register("reverse_diffusion")
def reverse_diffusion_predictor(
    sde: BaseSDE, score_fn, x, t, cond, key, dt=None,
    probability_flow: bool = False, noise=None,
):
    """Reverse-diffusion discretization step
    (reference: src/sdes/predictors.py:55-66). ``noise`` overrides the
    PRNG draw with an explicit standard-normal array (parity testing)."""
    f, G = sde.reverse_discretize(
        score_fn, x, t, cond, dt=dt, probability_flow=probability_flow
    )
    z = (jax.random.normal(key, x.shape, dtype=x.dtype)
         if noise is None else noise)
    x_mean = x - f
    G_b = bcast_right(jnp.asarray(G), x.ndim)
    x_new = x_mean + G_b * z
    return x_new, x_mean


@PredictorRegistry.register("none")
def none_predictor(sde, score_fn, x, t, cond, key, dt=None,
                   probability_flow: bool = False, noise=None):
    del sde, score_fn, t, cond, key, dt, probability_flow, noise
    return x, x
