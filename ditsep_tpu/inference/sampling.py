"""Diffusion inference samplers for v-objective and rectified-flow models.

TPU-native re-design of the stable-audio-tools sampling library
(reference: src/stable_audio_tools/inference/sampling.py:9-373). Every
sampler is a single `lax.scan` under jit -- the reference runs Python loops
with one host round-trip per step.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
ModelFn = Callable[..., Array]


def get_alphas_sigmas(t: Array) -> Tuple[Array, Array]:
    """v-diffusion cosine schedule (reference: sampling.py:9-13)."""
    return jnp.cos(t * math.pi / 2), jnp.sin(t * math.pi / 2)


def alpha_sigma_to_t(alpha: Array, sigma: Array) -> Array:
    return jnp.arctan2(sigma, alpha) / math.pi * 2


def distribution_shift_time(t: Array, seq_len: int, base_shift: float = 0.5,
                            max_shift: float = 1.15,
                            max_length: int = 4096, min_length: int = 256,
                            use_sine: bool = False) -> Array:
    """Sequence-length-dependent timestep shift
    (reference: sampling.py:24-40 DistributionShift)."""
    mu = -(base_shift + (max_shift - base_shift)
           * (seq_len - min_length) / (max_length - min_length))
    t_out = 1.0 - math.exp(mu) / (math.exp(mu) + (1.0 / (1.0 - t) - 1.0))
    if use_sine:
        t_out = jnp.sin(t_out * math.pi / 2)
    return t_out


def truncated_logistic_normal_rescaled(key: Array, shape,
                                       left_trunc: float = 0.075,
                                       right_trunc: float = 1.0) -> Array:
    """Truncated logistic-normal timestep sampler for RF training
    (reference: sampling.py:42-71)."""
    from jax.scipy.stats import norm

    logits = jax.random.normal(key, shape)
    cdf = norm.cdf(logits)
    lo = norm.cdf(jnp.log(left_trunc / (1 - left_trunc)))
    hi = norm.cdf(jnp.asarray(jnp.inf) if right_trunc >= 1.0
                  else jnp.log(right_trunc / (1 - right_trunc)))
    hi = jnp.where(jnp.isfinite(hi), hi, 1.0)
    trunc = lo + (hi - lo) * cdf
    samples = jax.nn.sigmoid(norm.ppf(trunc))
    return (samples - left_trunc) / (right_trunc - left_trunc)


def sample(model: ModelFn, x: Array, key: Optional[Array], steps: int,
           eta: float = 0.0, sigma_max: float = 1.0,
           dist_shift: bool = False, **extra_args) -> Array:
    """DDIM-style v-diffusion sampler (reference: sampling.py:173-228)."""
    t = jnp.linspace(sigma_max, 0, steps + 1)[:-1]
    if dist_shift:
        t = distribution_shift_time(t, x.shape[-1])
    alphas, sigmas = get_alphas_sigmas(t)
    batch = x.shape[0]
    keys = (jax.random.split(key, steps) if key is not None
            else jnp.zeros((steps, 2), jnp.uint32))

    def step(carry, inp):
        x, _ = carry
        i, k = inp
        ti = t[i]
        v = model(x, jnp.full((batch,), ti, x.dtype), **extra_args)
        pred = x * alphas[i] - v * sigmas[i]
        eps = x * sigmas[i] + v * alphas[i]
        is_last = i >= steps - 1
        a_next = jnp.where(is_last, alphas[i], alphas[jnp.minimum(
            i + 1, steps - 1)])
        s_next = jnp.where(is_last, sigmas[i], sigmas[jnp.minimum(
            i + 1, steps - 1)])
        ddim_sigma = eta * jnp.sqrt(
            jnp.clip(s_next ** 2 / jnp.clip(sigmas[i] ** 2, min=1e-20),
                     min=0)) * jnp.sqrt(
            jnp.clip(1 - alphas[i] ** 2 / jnp.clip(a_next ** 2, min=1e-20),
                     min=0))
        adjusted = jnp.sqrt(jnp.clip(s_next ** 2 - ddim_sigma ** 2, min=0))
        x_next = pred * a_next + eps * adjusted
        if eta:
            noise = jax.random.normal(k, x.shape, x.dtype)
            x_next = x_next + noise * ddim_sigma
        x_out = jnp.where(is_last, x, x_next)
        return (x_out, pred), None

    (x, pred), _ = jax.lax.scan(
        step, (x, x), (jnp.arange(steps), keys))
    return pred


def sample_discrete_euler(model: ModelFn, x: Array, steps: int,
                          sigma_max: float = 1.0, dist_shift: bool = False,
                          **extra_args) -> Array:
    """Euler rectified-flow sampler (reference: sampling.py:73-102)."""
    t = jnp.linspace(sigma_max, 0, steps + 1)
    if dist_shift:
        t = distribution_shift_time(t, x.shape[-1])
    batch = x.shape[0]

    def step(x, i):
        t_curr, t_prev = t[i], t[i + 1]
        v = model(x, jnp.full((batch,), t_curr, x.dtype), **extra_args)
        return x + (t_prev - t_curr) * v, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x


def sample_rk4(model: ModelFn, x: Array, steps: int, sigma_max: float = 1.0,
               dist_shift: bool = False, **extra_args) -> Array:
    """4th-order Runge-Kutta flow sampler (reference: sampling.py:104-136)."""
    t = jnp.linspace(sigma_max, 0, steps + 1)
    if dist_shift:
        t = distribution_shift_time(t, x.shape[-1])
    batch = x.shape[0]

    def f(x, ti):
        return model(x, jnp.full((batch,), ti, x.dtype), **extra_args)

    def step(x, i):
        t_curr, t_prev = t[i], t[i + 1]
        dt = t_prev - t_curr
        k1 = f(x, t_curr)
        k2 = f(x + dt * k1 / 2, t_curr + dt / 2)
        k3 = f(x + dt * k2 / 2, t_curr + dt / 2)
        k4 = f(x + dt * k3, t_prev)
        return x + dt * (k1 + 2 * k2 + 2 * k3 + k4) / 6, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x


def sample_flow_dpmpp(model: ModelFn, x: Array, steps: int,
                      sigma_max: float = 1.0, dist_shift: bool = False,
                      **extra_args) -> Array:
    """DPM-Solver++(2M) for rectified flow
    (reference: sampling.py:138-171)."""
    t = jnp.linspace(sigma_max, 0, steps + 1)
    if dist_shift:
        t = distribution_shift_time(t, x.shape[-1])
    batch = x.shape[0]
    eps = 1e-10

    def denoised_of(x, i):
        ti = t[i]
        v = model(x, jnp.full((batch,), ti, x.dtype), **extra_args)
        return x - ti * v

    def step(carry, i):
        x, old_denoised = carry
        denoised = denoised_of(x, i)
        t_curr, t_next = t[i], t[i + 1]
        # lambda(t) = log((1-t)/t)
        lam = lambda s: jnp.log(
            jnp.clip(1 - s, min=eps)) - jnp.log(jnp.clip(s, min=eps))
        h = lam(t_next) - lam(t_curr)
        # second-order correction using the previous denoised estimate
        t_prev = t[jnp.maximum(i - 1, 0)]
        h_last = lam(t_curr) - lam(t_prev)
        r = jnp.where(i > 0, h_last / jnp.where(h == 0, 1.0, h), 1.0)
        denoised_d = jnp.where(
            i > 0,
            (1 + 1 / (2 * r)) * denoised - (1 / (2 * r)) * old_denoised,
            denoised)
        sr = jnp.clip(t_next, min=eps) / jnp.clip(t_curr, min=eps)
        x = sr * x - jnp.expm1(-h) * (1 - t_next) * denoised_d
        x = jnp.where(t_next <= eps, denoised_d, x)
        return (x, denoised), None

    (x, _), _ = jax.lax.scan(step, (x, x), jnp.arange(steps))
    return x


def karras_sigmas(steps: int, sigma_min: float = 0.01,
                  sigma_max: float = 100.0, rho: float = 7.0) -> Array:
    """Karras et al. (2022) sigma schedule (k-diffusion
    get_sigmas_karras)."""
    ramp = jnp.linspace(0, 1, steps)
    min_inv = sigma_min ** (1 / rho)
    max_inv = sigma_max ** (1 / rho)
    sigmas = (max_inv + ramp * (min_inv - max_inv)) ** rho
    return jnp.concatenate([sigmas, jnp.zeros((1,))])


def sample_k(model: ModelFn, noise: Array, *, steps: int = 50,
             sigma_min: float = 0.5, sigma_max: float = 50.0,
             rho: float = 1.0, init_data=None, **extra_args) -> Array:
    """Karras-schedule Heun sampler for v-objective models
    (reference: sampling.py:250-330 sample_k, which wraps the model in
    k-diffusion's VDenoiser and runs dpmpp-3m-sde; here the same VDenoiser
    conversion drives a deterministic 2nd-order Heun integrator -- one
    lax.scan, no host loop).

    VDenoiser: for v-models, denoised(x, sigma) =
      x * c_skip + v(x * c_in, t(sigma)) * c_out,
    with c_skip = 1/(sigma^2+1), c_out = -sigma/sqrt(sigma^2+1),
    c_in = 1/sqrt(sigma^2+1), t = atan(sigma)*2/pi.
    """
    sigmas = karras_sigmas(steps, sigma_min, sigma_max, rho)
    batch = noise.shape[0]
    x = noise * sigmas[0]
    if init_data is not None:
        x = init_data + x

    def denoised_of(x, sigma):
        c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
        c_skip = 1.0 / (sigma ** 2 + 1.0)
        c_out = -sigma * c_in
        t = jnp.arctan(sigma) / math.pi * 2
        v = model(x * c_in, jnp.full((batch,), t, x.dtype), **extra_args)
        return x * c_skip + v * c_out

    def step(x, i):
        s, s_next = sigmas[i], sigmas[i + 1]
        d = (x - denoised_of(x, s)) / jnp.clip(s, min=1e-8)
        x_e = x + d * (s_next - s)

        def heun(_):
            d2 = (x_e - denoised_of(x_e, s_next)) / jnp.clip(
                s_next, min=1e-8)
            return x + 0.5 * (d + d2) * (s_next - s)

        x_new = jax.lax.cond(s_next > 0, heun, lambda _: x_e, None)
        return x_new, None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x


def get_bmask(i: Array, steps: int, mask: Array) -> Array:
    """Soft-mask inpainting schedule: binary mask hardens with step
    (reference: sampling.py:230-236)."""
    strength = (i + 1) / steps
    return jnp.where(mask <= strength, 1.0, 0.0)


def sample_rf(model: ModelFn, noise: Array, *, init_data=None,
              steps: int = 100, sampler_type: str = "euler",
              sigma_max: float = 1.0, **extra_args) -> Array:
    """Rectified-flow entry point (reference: sampling.py:333-373)."""
    sigma_max = min(sigma_max, 1.0)
    if init_data is not None:
        x = init_data * (1 - sigma_max) + noise * sigma_max
    else:
        x = noise
    if sampler_type == "euler":
        return sample_discrete_euler(model, x, steps, sigma_max,
                                     **extra_args)
    if sampler_type == "rk4":
        return sample_rk4(model, x, steps, sigma_max, **extra_args)
    if sampler_type == "dpmpp":
        return sample_flow_dpmpp(model, x, steps, sigma_max, **extra_args)
    raise ValueError(f"unknown rf sampler {sampler_type}")
