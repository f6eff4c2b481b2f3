"""Source-ordering and batch-normalization utilities (pure JAX).

Re-design of the reference helpers (reference: src/utils/separate.py:3-67).
All functions are shape-static and jit-safe; randomized ones take explicit
PRNG keys.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _gather_sources(x: Array, idx: Array) -> Array:
    """Reorder axis 1 of x per batch entry by idx (B, n_src)."""
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def shuffle_sources(key: Array, x: Array) -> Array:
    """Random per-batch-entry permutation along axis 1
    (reference: src/utils/separate.py:3-21)."""
    if x.ndim <= 1:
        return x
    c = jax.random.uniform(key, x.shape[:2])
    idx = jnp.argsort(c, axis=1)
    return _gather_sources(x, idx)


def power_order_sources(x: Array) -> Array:
    """Order sources by increasing variance
    (reference: src/utils/separate.py:35-53)."""
    if x.ndim <= 1:
        return x
    c = jnp.var(x, axis=tuple(range(2, x.ndim)))
    idx = jnp.argsort(c, axis=1)
    return _gather_sources(x, idx)


def select_elem_at_random(key: Array, x: Array, axis: int = -1) -> Array:
    """Pick one random slice along `axis` per batch entry, keepdims
    (reference: src/utils/separate.py:24-32)."""
    x = jnp.moveaxis(x, axis, -1)
    sel = jax.random.randint(key, (x.shape[0],), 0, x.shape[-1])
    sel = sel.reshape((-1,) + (1,) * (x.ndim - 1))
    x = jnp.take_along_axis(x, jnp.broadcast_to(sel, x.shape[:-1] + (1,)),
                            axis=-1)
    return jnp.moveaxis(x, -1, axis)


def normalize_batch(
    batch: Tuple[Array, Optional[Array]],
    lengths: Optional[Array] = None,
) -> Tuple[Tuple[Array, Optional[Array]], Array, Array]:
    """Normalize by the mixture's mean/std (reference:
    src/utils/separate.py:56-63). std uses the unbiased (ddof=1) estimator to
    match torch.std.

    ``lengths`` (B,) restricts the statistics to each item's valid
    samples and re-zeroes the padded tail after normalization. Without
    it, batch-padding zeros dilute the std (a 1600-sample item padded to
    2600 sees its input amplified ~1.27x vs native) AND the padded tail
    becomes the nonzero constant -mean/std instead of the zero frames
    the model's own %64 pad produces — both off the training condition.
    Masked stats + re-zeroed tail make the normalized padded batch
    IDENTICAL to the native-length batch on the valid region."""
    mix, tgt = batch
    if lengths is None:
        mean = jnp.mean(mix, axis=(1, 2), keepdims=True)
        std = jnp.clip(jnp.std(mix, axis=(1, 2), keepdims=True, ddof=1),
                       min=1e-5)
        mix = (mix - mean) / std
        if tgt is not None:
            tgt = (tgt - mean) / std
        return (mix, tgt), mean, std
    valid = (jnp.arange(mix.shape[-1])[None, None, :]
             < lengths[:, None, None])
    n = (lengths[:, None, None] * mix.shape[1]).astype(mix.dtype)
    mean = jnp.sum(jnp.where(valid, mix, 0.0), axis=(1, 2),
                   keepdims=True) / jnp.maximum(n, 1.0)
    var = jnp.sum(jnp.where(valid, (mix - mean) ** 2, 0.0), axis=(1, 2),
                  keepdims=True) / jnp.maximum(n - 1.0, 1.0)
    std = jnp.clip(jnp.sqrt(var), min=1e-5)
    mix = jnp.where(valid, (mix - mean) / std, 0.0)
    if tgt is not None:
        tgt = jnp.where(valid, (tgt - mean) / std, 0.0)
    return (mix, tgt), mean, std


def denormalize_batch(x: Array, mean: Array, std: Array) -> Array:
    """(reference: src/utils/separate.py:66-67)."""
    return x * std + mean


def pad_to_hop(x: Array, hop_length: int) -> Array:
    """Zero-pad the last axis up to a multiple of hop_length
    (reference: src/utils/torch_utils.py:12-18). Intentional deviation:
    the reference pads a FULL extra hop when the length is already a
    multiple (pad_len = hop - 0); here that case is a no-op, so exact
    multiples keep their latent frame count."""
    rem = x.shape[-1] % hop_length
    if rem == 0:
        return x
    pad = hop_length - rem
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
