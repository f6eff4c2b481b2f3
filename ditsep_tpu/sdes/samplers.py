"""Samplers: predictor-corrector, scheduled-grid PC, probability-flow ODE,
and Schroedinger-bridge samplers.

TPU-first re-design of the reference sampling layer
(reference: src/sdes/__init__.py:49-389). The reference runs the reverse
loop in Python, one utterance at a time; here the entire N-step loop is a
single ``lax.scan`` inside one jit, so the whole batch of utterances rides
the MXU together and the loop has zero host round-trips. Shard the batch
axis over a mesh and the same function scales to a pod slice.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from ditsep_tpu.sdes.core import BaseSDE, bcast_right
from ditsep_tpu.sdes.correctors import CorrectorRegistry
from ditsep_tpu.sdes.predictors import PredictorRegistry, reverse_diffusion_predictor

Array = jax.Array
ScoreFn = Callable[[Array, Array, Array], Array]


def _time_grid(schedule: Optional[str], T: float, eps: float, n: int) -> Array:
    """Reverse-time grids, uniform ('linear') or logarithmic
    ('log'/'revlog') (reference: src/sdes/__init__.py:95-114).

    NOTE on 'linear' vs schedule=None in pc_sample: both are uniform but
    they mirror DIFFERENT reference samplers. None follows the plain
    get_pc_sampler (linspace(T, eps, N): last step evaluates AT eps);
    'linear' follows get_pc_scheduled_sampler (N+1 grid points, steps at
    the first N, so eps itself is never evaluated and the spacing is
    (T-eps)/N). Same N therefore gives numerically different samples --
    faithful to the reference pair, not a bug."""
    if schedule in (None, "linear"):
        return jnp.linspace(T, eps, n)
    if schedule == "log":
        return jnp.logspace(math.log10(T), math.log10(eps), n)
    if schedule == "revlog":
        return jnp.logspace(math.log10(eps), math.log10(T), n)[::-1]
    raise NotImplementedError(f"Schedule '{schedule}' does not exist")


def pc_sample(
    sde: BaseSDE,
    score_fn: ScoreFn,
    key: Array,
    y: Array,
    *,
    predictor: str = "reverse_diffusion",
    corrector: str = "ald2",
    N: Optional[int] = None,
    snr: float = 0.5,
    corrector_steps: int = 1,
    denoise: bool = True,
    eps: float = 3e-2,
    n_spkrs: int = 2,
    probability_flow: bool = False,
    schedule: Optional[str] = None,
    use_schedule_dt: bool = False,
    intermediate: bool = False,
    noise=None,
):
    """Predictor-corrector sampling as one `lax.scan`.

    Mirrors the semantics of reference src/sdes/__init__.py:133-193 (plain)
    and :49-130 (scheduled). Note the reference's scheduled sampler passes a
    per-step ``dt`` that is silently dropped by ``getattr(kwargs, "dt", 1/N)``
    (reference src/sdes/sdes.py:104, predictors.py:45) so its effective step
    is always 1/N; set ``use_schedule_dt=True`` for the corrected integrator.

    ``noise`` optionally replaces every PRNG draw with explicit
    standard-normal arrays -- a tuple ``(prior_z (B,n_spkrs,...),
    corrector_z (N, corrector_steps, B,n_spkrs,...), predictor_z
    (N, B,n_spkrs,...))`` -- so a sampling run is exactly reproducible
    against an external oracle (the torch reference pipeline in
    tests/test_full_pipeline_parity.py consumes the same arrays).

    Returns ``(x, nfe)`` or ``(x, nfe, trajectory)`` if ``intermediate``.
    """
    if N is not None:
        sde = dataclasses.replace(sde, N=N)
    n = sde.N
    predictor_fn = PredictorRegistry.get_by_name(predictor)
    corrector_fn = CorrectorRegistry.get_by_name(corrector)

    batch = y.shape[0]
    shape = (batch, n_spkrs) + tuple(y.shape[2:])

    key, k_prior = jax.random.split(key)
    if noise is None:
        prior_z = corr_z = pred_z = None
        x0 = sde.prior_sampling(k_prior, shape, y)
    else:
        prior_z, corr_z, pred_z = (jnp.asarray(a, y.dtype) for a in noise)
        x0 = sde.prior_from_noise(prior_z, shape, y)

    if schedule is None:
        timesteps = jnp.linspace(sde.T, eps, n)
        dts = None
    else:
        grid = _time_grid(schedule, sde.T, eps, n + 1)
        timesteps = grid[:-1]
        dts = jnp.abs(grid[:-1] - grid[1:]) if use_schedule_dt else None

    # key width is PRNG-impl-dependent (threefry: 2 uint32, rbg: 4) --
    # reshape by it rather than hard-coding, so the TPU hardware RBG
    # generator (JAX_DEFAULT_PRNG_IMPL=rbg) works too
    raw = jax.random.split(key, n * 2)
    step_keys = raw.reshape(n, 2, *raw.shape[1:])

    def step(carry, inputs):
        x, _ = carry
        (t, keys), inputs = inputs[:2], inputs[2:]
        if dts is not None:
            dt, inputs = inputs[0], inputs[1:]
        else:
            dt = None
        c_z, p_z = inputs if inputs else (None, None)
        t_vec = jnp.full((batch,), t, dtype=y.dtype)
        x, _ = corrector_fn(
            sde, score_fn, x, t_vec, y, keys[0], snr=snr,
            n_steps=corrector_steps, noises=c_z,
        )
        x, x_mean = predictor_fn(
            sde, score_fn, x, t_vec, y, keys[1], dt=dt,
            probability_flow=probability_flow, noise=p_z,
        )
        carry = (x, x_mean)
        return carry, carry if intermediate else None

    inputs = (timesteps, step_keys)
    if dts is not None:
        inputs = inputs + (dts,)
    if corr_z is not None:
        inputs = inputs + (corr_z, pred_z)
    (xt, xt_mean), traj = jax.lax.scan(step, (x0, x0), inputs)

    x_result = xt_mean if denoise else xt
    # true score-evaluation count ('none' predictor/corrector cost
    # nothing; the reference reports sde.N*(n_steps+1) unconditionally,
    # src/sdes/__init__.py:187 -- we report honest cost for benchmarks)
    nfe = n * (corrector_steps * (corrector != "none")
               + (predictor != "none"))
    if intermediate:
        return x_result, nfe, traj
    return x_result, nfe


def ab2_sample(
    sde: BaseSDE,
    score_fn: ScoreFn,
    key: Array,
    y: Array,
    *,
    N: Optional[int] = None,
    eps: float = 3e-2,
    denoise: bool = True,
    n_spkrs: int = 2,
    stochastic: bool = False,
):
    """Second-order Adams-Bashforth multistep reverse integrator.

    An NFE-efficiency extension beyond the reference's sampler family
    (multistep acceleration in the spirit of the corrected-AB literature,
    e.g. 'Gotta Go Fast' / CAB): reuses the PREVIOUS step's reverse drift
    so each step costs ONE score evaluation yet integrates at 2nd order --
    half the NFE of the PC sampler's predictor+corrector pair at the same
    step count. Deterministic probability-flow by default; set
    ``stochastic=True`` to re-add the diffusion noise (AB2 on the drift,
    Euler-Maruyama on the noise).

    Returns (x, nfe).
    """
    if N is not None:
        sde = dataclasses.replace(sde, N=N)
    n = sde.N
    batch = y.shape[0]
    shape = (batch, n_spkrs) + tuple(y.shape[2:])
    key, k_prior = jax.random.split(key)
    x0 = sde.prior_sampling(k_prior, shape, y)
    # n-point grid -> n-1 integration segments (evaluating the drift at
    # the segment's left endpoint); the final denoise step makes NFE = n
    n_steps = max(n - 1, 1)
    timesteps = jnp.linspace(sde.T, eps, n)[:n_steps]
    dt = (sde.T - eps) / n_steps
    step_keys = jax.random.split(key, n_steps)

    def drift(x, t_scalar):
        t_vec = jnp.full((batch,), t_scalar, dtype=y.dtype)
        f, g = sde.reverse_drift_diffusion(
            score_fn, x, t_vec, y, probability_flow=not stochastic)
        return f, g

    def step(carry, inputs):
        x, f_prev, has_prev = carry
        t, k = inputs
        f, g = drift(x, t)
        # AB2: x' = x - dt * (3/2 f - 1/2 f_prev); first step falls back
        # to Euler (has_prev = 0)
        f_ab = jnp.where(has_prev > 0, 1.5 * f - 0.5 * f_prev, f)
        x_mean = x - dt * f_ab
        if stochastic:
            z = jax.random.normal(k, x.shape, dtype=x.dtype)
            g_b = bcast_right(g, x.ndim)
            x_new = x_mean + g_b * jnp.sqrt(dt) * z
        else:
            x_new = x_mean
        return (x_new, f, jnp.ones(())), x_mean

    (x_final, _, _), means = jax.lax.scan(
        step, (x0, jnp.zeros_like(x0), jnp.zeros(())),
        (timesteps, step_keys))
    x = means[-1] if not stochastic else x_final
    nfe = n_steps
    if denoise:
        # final noise-free reverse-diffusion step at t=eps (the PC
        # sampler's denoise convention removes the t_eps truncation floor)
        t_vec = jnp.full((batch,), eps, dtype=y.dtype)
        _, x = reverse_diffusion_predictor(
            sde, score_fn, x, t_vec, y, step_keys[-1])
        nfe += 1
    return x, nfe


def ode_sample(
    sde: BaseSDE,
    score_fn: ScoreFn,
    key: Array,
    y: Array,
    *,
    N: Optional[int] = None,
    eps: float = 3e-2,
    denoise: bool = True,
    n_spkrs: Optional[int] = 2,
    method: str = "rk4",
):
    """Probability-flow ODE sampler with fixed-step integrators.

    The reference ships the black-box scipy RK45 path
    (src/sdes/__init__.py:196-281) which round-trips device<->host on every
    function evaluation. On TPU that is the wrong design: we integrate the
    probability-flow ODE with a fixed-step RK4/Heun/Euler scheme inside one
    `lax.scan` (static NFE, no host sync). For scipy parity see
    `ode_sample_scipy`.
    """
    if N is not None:
        sde = dataclasses.replace(sde, N=N)
    n = sde.N
    if n_spkrs is None:
        shape = y.shape
    else:
        shape = (y.shape[0], n_spkrs) + tuple(y.shape[2:])

    key, k_prior = jax.random.split(key)
    x0 = sde.prior_sampling(k_prior, shape, y)

    grid = jnp.linspace(sde.T, eps, n + 1)
    batch = y.shape[0]

    def drift(x, t_scalar):
        t_vec = jnp.full((batch,), t_scalar, dtype=y.dtype)
        f, _ = sde.reverse_drift_diffusion(
            score_fn, x, t_vec, y, probability_flow=True
        )
        return f

    def step(x, i):
        t0, t1 = grid[i], grid[i + 1]
        h = t1 - t0  # negative (reverse time)
        if method == "euler":
            x = x + h * drift(x, t0)
            nfe_step = 1
        elif method == "heun":
            k1 = drift(x, t0)
            k2 = drift(x + h * k1, t1)
            x = x + 0.5 * h * (k1 + k2)
            nfe_step = 2
        elif method == "rk4":
            k1 = drift(x, t0)
            k2 = drift(x + 0.5 * h * k1, t0 + 0.5 * h)
            k3 = drift(x + 0.5 * h * k2, t0 + 0.5 * h)
            k4 = drift(x + h * k3, t1)
            x = x + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            nfe_step = 4
        else:
            raise ValueError(f"unknown method {method}")
        return x, nfe_step

    def body(x, i):
        x, _ = step(x, i)
        return x, None

    x, _ = jax.lax.scan(body, x0, jnp.arange(n))

    nfe = n * {"euler": 1, "heun": 2, "rk4": 4}[method]
    if denoise:
        # one reverse-diffusion predictor step at t=eps without noise
        t_vec = jnp.full((batch,), eps, dtype=y.dtype)
        _, x = reverse_diffusion_predictor(sde, score_fn, x, t_vec, y, key)
        nfe += 1
    return x, nfe


def ode_sample_scipy(
    sde: BaseSDE,
    score_fn: ScoreFn,
    key: Array,
    y: Array,
    *,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    method: str = "RK45",
    eps: float = 3e-2,
    denoise: bool = True,
    n_spkrs: Optional[int] = 2,
):
    """Black-box adaptive ODE solve on host (scipy), for parity with the
    reference sampler (src/sdes/__init__.py:196-281). Not jittable; use
    `ode_sample` for production. ``n_spkrs`` sets the separated-state
    channel count like every other sampler (None = y already has state
    shape)."""
    import numpy as np
    from scipy import integrate

    if n_spkrs is None:
        state_shape = y.shape
    else:
        state_shape = (y.shape[0], n_spkrs) + tuple(y.shape[2:])
    key, k_prior = jax.random.split(key)
    x = sde.prior_sampling(k_prior, state_shape, y)
    shape = x.shape
    dtype = x.dtype

    def ode_func(t, x_flat):
        x_arr = jnp.asarray(x_flat.reshape(shape), dtype=dtype)
        t_vec = jnp.full((y.shape[0],), t, dtype=y.dtype)
        drift, _ = sde.reverse_drift_diffusion(
            score_fn, x_arr, t_vec, y, probability_flow=True
        )
        return np.asarray(drift).reshape(-1)

    solution = integrate.solve_ivp(
        ode_func, (sde.T, eps), np.asarray(x).reshape(-1),
        rtol=rtol, atol=atol, method=method,
    )
    nfe = solution.nfev
    x = jnp.asarray(solution.y[:, -1].reshape(shape), dtype=dtype)
    if denoise:
        t_vec = jnp.full((y.shape[0],), eps, dtype=y.dtype)
        _, x = reverse_diffusion_predictor(sde, score_fn, x, t_vec, y, key)
        nfe += 1
    return x, nfe


def sb_sample(
    sde,
    score_fn: ScoreFn,
    key: Array,
    y: Array,
    *,
    eps: float = 1e-4,
    sampler_type: str = "ode",
    n_spkrs: int = 2,
):
    """First-order Schroedinger-bridge SDE/ODE sampler as one `lax.scan`
    (reference: src/sdes/__init__.py:284-389, after NVIDIA NeMo).

    The model estimate is weighted against the previous state and either
    noise (SDE) or the prior mean y (ODE).
    """
    n = sde.N
    batch = y.shape[0]
    # the bridge weights involve ~1/sqrt(eps)-scale products whose
    # cancellation needs float32: accumulate the whole scan in f32 and
    # cast back at the end (the score_fn still sees the caller's dtype
    # via closure -- only the integrator state is widened)
    out_dtype = y.dtype
    y = y.astype(jnp.float32)
    xt0 = jnp.concatenate([y] * n_spkrs, axis=1)  # y tiled over sources

    grid = jnp.linspace(sde.T, eps, n + 1)
    t_prev0 = jnp.full((batch,), grid[0], dtype=y.dtype)
    sp0, _, sbp0, ap0, _, _ = sde.sigmas_alphas(t_prev0)

    step_keys = jax.random.split(key, n)

    def step(carry, inputs):
        xt, alpha_prev, sigma_prev, sigma_bar_prev = carry
        i, t, k = inputs
        time = jnp.full((batch,), t, dtype=y.dtype)
        sigma_t, sigma_T, sigma_bart, alpha_t, alpha_T, alpha_bart = (
            sde.sigmas_alphas(time)
        )
        estimate = score_fn(xt, time, y)

        if sampler_type == "sde":
            w_prev = alpha_t * sigma_t ** 2 / (alpha_prev * sigma_prev ** 2 + sde.eps)
            tmp = 1.0 - sigma_t ** 2 / (sigma_prev ** 2 + sde.eps)
            w_est = alpha_t * tmp
            w_z = alpha_t * sigma_t * jnp.sqrt(tmp)
            # last step: no noise
            w_z = jnp.where(i == n - 1, 0.0, w_z)
            z = jax.random.normal(k, xt.shape, dtype=xt.dtype)
            xt = (
                bcast_right(w_prev, xt.ndim) * xt
                + bcast_right(w_est, xt.ndim) * estimate
                + bcast_right(w_z, xt.ndim) * z
            )
        else:  # ode
            w_prev = (
                alpha_t * sigma_t * sigma_bart
                / (alpha_prev * sigma_prev * sigma_bar_prev + sde.eps)
            )
            w_est = (
                alpha_t / (sigma_T ** 2 + sde.eps)
                * (sigma_bart ** 2
                   - sigma_bar_prev * sigma_t * sigma_bart / (sigma_prev + sde.eps))
            )
            w_prior = (
                alpha_t / (alpha_T * sigma_T ** 2 + sde.eps)
                * (sigma_t ** 2
                   - sigma_prev * sigma_t * sigma_bart / (sigma_bar_prev + sde.eps))
            )
            xt = (
                bcast_right(w_prev, xt.ndim) * xt
                + bcast_right(w_est, xt.ndim) * estimate
                + bcast_right(w_prior, xt.ndim) * xt0
            )
        return (xt, alpha_t, sigma_t, sigma_bart), None

    inputs = (jnp.arange(n), grid[1:], step_keys)
    (xt, *_), _ = jax.lax.scan(step, (xt0, ap0, sp0, sbp0), inputs)
    return xt.astype(out_dtype), n
