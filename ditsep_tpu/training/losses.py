"""In-graph audio losses: SI-SDR with permutation-invariant training.

Replaces fast_bss_eval.si_sdr_pit_loss used by the reference for validation
monitoring (reference: src/models/diffsep/losses.py:6-41). Fully jittable:
the permutation search is a static min over the (n_src)! assignments of the
pairwise metric matrix (n_src is 2 or 3 here, so brute force beats the
Hungarian algorithm and keeps the graph static).
"""
from __future__ import annotations

import itertools
from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array


def si_sdr_pairwise(
    est: Array, ref: Array, *, zero_mean: bool = False,
    clamp_db: Optional[float] = None, eps: float = 1e-8,
) -> Array:
    """Pairwise SI-SDR matrix.

    Args:
      est: (..., n_est, T) estimates.
      ref: (..., n_ref, T) references.
    Returns (..., n_est, n_ref) SI-SDR in dB of est_i against ref_j.

    clamp_db soft-limits the value to +-clamp_db by regularizing the
    energy ratio (the same mechanism fast_bss_eval uses), so gradients stay
    smooth near perfect reconstruction.
    """
    if zero_mean:
        est = est - jnp.mean(est, axis=-1, keepdims=True)
        ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    # scale-invariant projection of est onto each ref
    dot = jnp.einsum("...et,...rt->...er", est, ref)
    ref_pow = jnp.sum(ref ** 2, axis=-1)[..., None, :]  # (..., 1, n_ref)
    est_pow = jnp.sum(est ** 2, axis=-1)[..., :, None]  # (..., n_est, 1)
    # ||s_target||^2 = dot^2 / ||ref||^2 ; ||e||^2 = ||est||^2 - dot^2/||ref||^2
    coh = dot ** 2 / jnp.clip(ref_pow * est_pow, min=eps)  # squared cosine
    ratio = coh / jnp.clip(1.0 - coh, min=eps)
    if clamp_db is not None:
        tau = 10.0 ** (-clamp_db / 10.0)
        # soft clamp: ratio -> (coh + tau*(1-coh)) / ((1-coh) + tau*coh)
        ratio = (coh + tau * (1.0 - coh)) / ((1.0 - coh) + tau * coh)
    return 10.0 * jnp.log10(jnp.clip(ratio, min=eps))


def si_sdr_pit(
    est: Array, ref: Array, *, zero_mean: bool = False,
    clamp_db: Optional[float] = None,
) -> Array:
    """Permutation-optimal mean SI-SDR per batch entry.

    est, ref: (B, n_src, T). Returns (B,) dB values (higher is better).
    Mirrors fast_bss_eval.si_sdr_pit_loss up to sign
    (reference: src/models/diffsep/losses.py:21-24 applies sign_flip=True).
    """
    mat = si_sdr_pairwise(est, ref, zero_mean=zero_mean, clamp_db=clamp_db)
    n = est.shape[-2]
    perms = list(itertools.permutations(range(n)))
    scores = jnp.stack(
        [jnp.mean(mat[..., jnp.arange(n), jnp.asarray(p)], axis=-1)
         for p in perms], axis=-1)
    return jnp.max(scores, axis=-1)


def si_sdr_loss(
    est: Array, ref: Array, *, zero_mean: bool = False,
    clamp_db: Optional[float] = None, reduction: str = "mean",
    sign_flip: bool = True,
) -> Array:
    """Drop-in for the reference SISDRLoss module
    (reference: src/models/diffsep/losses.py:6-35). With sign_flip=True the
    returned value is the (positive) SI-SDR, as logged for val/si_sdr."""
    v = -si_sdr_pit(est, ref, zero_mean=zero_mean, clamp_db=clamp_db)
    if sign_flip:
        v = -v
    if reduction == "mean":
        return jnp.mean(v)
    if reduction == "sum":
        return jnp.sum(v)
    if reduction == "none":
        return v
    raise ValueError("reduction must be one of 'none'|'mean'|'sum'")
