"""Audio language model over residual-VQ token streams.

TPU-native re-design of the stable-audio-tools LM stack
(reference: src/stable_audio_tools/models/lm.py:1-540, lm_backbone.py,
codebook_patterns.py:1-544 -- the MusicGen-style delay-pattern LM over
discrete codec tokens). Capability-level: delay/parallel codebook
patterns, a causal ContinuousTransformer backbone, per-codebook embedding
and prediction heads, and scan-based autoregressive sampling.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.transformer import ContinuousTransformer

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class DelayPattern:
    """MusicGen delay pattern: codebook q is shifted right by q steps so
    step t attends only to coarser codebooks' earlier decisions
    (reference: codebook_patterns.py DelayedPatternProvider)."""

    n_q: int
    special_token: int

    @property
    def extra_steps(self) -> int:
        return self.n_q - 1

    def apply(self, tokens: Array) -> Array:
        """(B, n_q, T) -> (B, n_q, T + n_q - 1) delayed layout."""
        b, n_q, t = tokens.shape
        out = jnp.full((b, n_q, t + self.extra_steps), self.special_token,
                       tokens.dtype)
        for q in range(n_q):
            out = out.at[:, q, q:q + t].set(tokens[:, q])
        return out

    def revert(self, delayed: Array) -> Array:
        """(B, n_q, T + n_q - 1) -> (B, n_q, T)."""
        b, n_q, tt = delayed.shape
        t = tt - self.extra_steps
        return jnp.stack([delayed[:, q, q:q + t] for q in range(n_q)],
                         axis=1)


@dataclasses.dataclass(frozen=True)
class ParallelPattern:
    """All codebooks predicted at the same step
    (reference: codebook_patterns.py ParallelPatternProvider)."""

    n_q: int
    special_token: int

    @property
    def extra_steps(self) -> int:
        return 0

    def apply(self, tokens: Array) -> Array:
        return tokens

    def revert(self, delayed: Array) -> Array:
        return delayed


class AudioLM(nn.Module):
    """Causal LM over (B, n_q, T) token grids
    (reference: lm.py AudioLanguageModel/AudioLanguageModelWrapper)."""

    n_quantizers: int = 4
    codebook_size: int = 1024
    dim: int = 256
    depth: int = 4
    num_heads: int = 4
    dtype: Any = None

    @property
    def special_token(self) -> int:
        return self.codebook_size  # one extra id for pattern padding / BOS

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        """tokens (B, n_q, S) in delayed layout -> logits
        (B, n_q, S, codebook_size). Causal: position s sees s' < s."""
        b, n_q, s = tokens.shape
        emb = 0.0
        for q in range(n_q):
            emb = emb + nn.Embed(
                self.codebook_size + 1, self.dim,
                name=f"emb_{q}")(tokens[:, q])
        h = ContinuousTransformer(
            dim=self.dim, depth=self.depth,
            dim_heads=self.dim // self.num_heads, causal=True,
            name="backbone", dtype=self.dtype)(emb)
        logits = [nn.Dense(self.codebook_size, name=f"head_{q}",
                           dtype=self.dtype)(h) for q in range(n_q)]
        return jnp.stack(logits, axis=1)


def lm_loss(model: AudioLM, params, tokens: Array,
            pattern: Optional[DelayPattern] = None) -> Array:
    """Next-step cross-entropy in the delayed layout; pattern padding
    positions are masked out."""
    pattern = pattern or DelayPattern(model.n_quantizers,
                                      model.special_token)
    delayed = pattern.apply(tokens)
    # input: BOS (special) + delayed[:-1]; target: delayed
    bos = jnp.full(delayed.shape[:2] + (1,), model.special_token,
                   delayed.dtype)
    inp = jnp.concatenate([bos, delayed[..., :-1]], axis=-1)
    logits = model.apply(params, inp)
    valid = delayed != model.special_token
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = jnp.clip(delayed, 0, model.codebook_size - 1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * valid) / jnp.clip(jnp.sum(valid), min=1.0)


def lm_generate(model: AudioLM, params, key: Array, batch: int,
                length: int, temperature: float = 1.0,
                pattern: Optional[DelayPattern] = None) -> Array:
    """Autoregressive sampling as a lax.scan over steps; returns
    (B, n_q, length) tokens in canonical layout."""
    pattern = pattern or DelayPattern(model.n_quantizers,
                                      model.special_token)
    steps = length + pattern.extra_steps
    n_q = model.n_quantizers
    seq = jnp.full((batch, n_q, steps + 1), model.special_token, jnp.int32)

    def step(carry, i):
        seq, k = carry
        k, sub = jax.random.split(k)
        logits = model.apply(params, seq[..., :-1])  # full causal pass
        step_logits = jax.lax.dynamic_slice_in_dim(
            logits, i, 1, axis=2)[:, :, 0] / max(temperature, 1e-6)
        sample = jax.random.categorical(sub, step_logits, axis=-1)
        seq = jax.lax.dynamic_update_slice_in_dim(
            seq, sample[..., None].astype(jnp.int32), i + 1, axis=2)
        return (seq, k), None

    (seq, _), _ = jax.lax.scan(step, (seq, key), jnp.arange(steps))
    return pattern.revert(seq[..., 1:])
