"""Audio language model over residual-VQ token streams.

TPU-native re-design of the stable-audio-tools LM stack
(reference: src/stable_audio_tools/models/lm.py:1-540, lm_backbone.py,
codebook_patterns.py:1-544 -- the MusicGen-style delay-pattern LM over
discrete codec tokens): delay/parallel codebook patterns, a causal
ContinuousTransformer backbone with cross-attention / prepend / global
conditioning, per-codebook embedding and prediction heads, and KV-cached
generation (prefill + lax.scan single-token decode; O(T) network work)
with temperature / top-k / top-p sampling and classifier-free guidance.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

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


@dataclasses.dataclass(frozen=True)
class CustomDelayPattern:
    """Delay pattern with arbitrary per-codebook delays
    (reference: codebook_patterns.py:302-355 DelayedPatternProvider with
    explicit `delays`)."""

    n_q: int
    special_token: int
    delays: tuple = ()

    def __post_init__(self):
        d = self.delays or tuple(range(self.n_q))
        assert len(d) == self.n_q and tuple(sorted(d)) == tuple(d)
        object.__setattr__(self, "delays", tuple(d))

    @property
    def extra_steps(self) -> int:
        return max(self.delays)

    def apply(self, tokens: Array) -> Array:
        b, n_q, t = tokens.shape
        out = jnp.full((b, n_q, t + self.extra_steps), self.special_token,
                       tokens.dtype)
        for q, d in enumerate(self.delays):
            out = out.at[:, q, d:d + t].set(tokens[:, q])
        return out

    def revert(self, delayed: Array) -> Array:
        t = delayed.shape[-1] - self.extra_steps
        return jnp.stack([delayed[:, q, d:d + t]
                          for q, d in enumerate(self.delays)], axis=1)


@dataclasses.dataclass(frozen=True)
class CoarseFirstPattern:
    """All of codebook 0 first, then the remaining codebooks (optionally
    delayed). Non-causal in the fine codebooks w.r.t. the coarse one, so
    generation must run the full training duration
    (reference: codebook_patterns.py:490-525 CoarseFirstPattern)."""

    n_q: int
    special_token: int
    delays: tuple = ()

    def __post_init__(self):
        d = self.delays or tuple([0] * (self.n_q - 1))
        assert len(d) == self.n_q - 1
        object.__setattr__(self, "delays", tuple(d))

    def seq_len(self, t: int) -> int:
        return 2 * t + (max(self.delays) if self.delays else 0)

    @property
    def extra_steps(self) -> int:  # beyond T, for a (B,n_q,S) grid
        raise NotImplementedError("use seq_len(); S depends on T")

    def apply(self, tokens: Array) -> Array:
        b, n_q, t = tokens.shape
        s = self.seq_len(t)
        out = jnp.full((b, n_q, s), self.special_token, tokens.dtype)
        out = out.at[:, 0, :t].set(tokens[:, 0])
        for q, d in enumerate(self.delays):
            out = out.at[:, q + 1, t + d:t + d + t].set(tokens[:, q + 1])
        return out

    def revert(self, grid: Array) -> Array:
        b, n_q, s = grid.shape
        max_d = max(self.delays) if self.delays else 0
        t = (s - max_d) // 2
        rows = [grid[:, 0, :t]]
        for q, d in enumerate(self.delays):
            rows.append(grid[:, q + 1, t + d:t + d + t])
        return jnp.stack(rows, axis=1)


@dataclasses.dataclass(frozen=True)
class UnrolledPattern:
    """Unrolled (flattened) pattern: each timestep expands into
    ``n_inner`` sequence steps and codebook q is emitted at inner step
    ``flattening[q]`` -- full flattening by default, partial flattening
    by grouping codebooks onto the same inner step, with optional
    per-codebook ``delays`` unrolled into the emission order
    (reference: codebook_patterns.py:369-488 UnrolledPatternProvider;
    the sequence starts with one empty step like the reference's
    num_virtual_steps = T * n_inner + 1). Codebooks sharing an inner
    step must share a delay, as in the reference. The layout is built
    host-side per (static) length, so apply/revert stay pure
    gather/scatter under jit."""

    n_q: int
    special_token: int
    flattening: tuple = ()
    delays: tuple = ()

    def __post_init__(self):
        f = self.flattening or tuple(range(self.n_q))
        assert len(f) == self.n_q and tuple(sorted(f)) == tuple(f)
        object.__setattr__(self, "flattening", tuple(f))
        d = self.delays or tuple([0] * self.n_q)
        assert len(d) == self.n_q and tuple(sorted(d)) == tuple(d)
        step_delay = {}
        for q, (st, dq) in enumerate(zip(f, d)):
            assert step_delay.setdefault(st, dq) == dq, (
                "codebooks flattened to the same inner step must share "
                "a delay")
        object.__setattr__(self, "delays", tuple(d))

    @property
    def n_inner(self) -> int:
        return max(self.flattening) + 1

    @property
    def max_delay(self) -> int:
        return max(self.delays)

    def _layout(self, t: int):
        """Sequence layout for ``t`` timesteps: a list whose entry s is
        the list of (timestep, codebook) coordinates emitted at sequence
        step s. Mirrors the reference's delayed emission order: each
        inner step of timestep ``t0`` is keyed by ``t0 + delay`` and the
        sequence is the stable sort of those keys
        (codebook_patterns.py:462-487)."""
        step_cbs = {}
        for q, st in enumerate(self.flattening):
            step_cbs.setdefault(st, []).append(q)
        max_t = t + self.max_delay
        indexed = [(-1, [])]
        for t0 in range(max_t):
            for st in range(self.n_inner):
                if st in step_cbs:
                    qs = step_cbs[st]
                    t_for_q = t0 + self.delays[qs[0]]
                    if t_for_q < max_t:
                        indexed.append((t_for_q, [(t0, q) for q in qs]))
                else:
                    indexed.append((t0, []))
        return [coords for _, coords in sorted(indexed)]

    def seq_len(self, t: int) -> int:
        if self.max_delay == 0:
            return 1 + t * self.n_inner
        return len(self._layout(t))

    def _timesteps_for_seq(self, s: int) -> int:
        if self.max_delay == 0:
            return (s - 1) // self.n_inner
        t = max(0, (s - 1) // self.n_inner - self.max_delay)
        while self.seq_len(t) < s:
            t += 1
        assert self.seq_len(t) == s, "grid length matches no timestep count"
        return t

    def _scatter_indices(self, t: int):
        """(s_idx, q_idx, t_idx) arrays: token (q, t0 < t) lives at
        sequence position s in the layout."""
        s_idx, q_idx, t_idx = [], [], []
        for s, coords in enumerate(self._layout(t)):
            for (t0, q) in coords:
                if t0 < t:
                    s_idx.append(s)
                    q_idx.append(q)
                    t_idx.append(t0)
        return (np.asarray(s_idx), np.asarray(q_idx), np.asarray(t_idx))

    def apply(self, tokens: Array) -> Array:
        b, n_q, t = tokens.shape
        s_idx, q_idx, t_idx = self._scatter_indices(t)
        out = jnp.full((b, n_q, self.seq_len(t)), self.special_token,
                       tokens.dtype)
        return out.at[:, q_idx, s_idx].set(tokens[:, q_idx, t_idx])

    def revert(self, grid: Array) -> Array:
        b, n_q, s = grid.shape
        t = self._timesteps_for_seq(s)
        s_idx, q_idx, t_idx = self._scatter_indices(t)
        out = jnp.full((b, n_q, t), self.special_token, grid.dtype)
        return out.at[:, q_idx, t_idx].set(grid[:, q_idx, s_idx])


@dataclasses.dataclass(frozen=True)
class MusicLMPattern:
    """Group-flattened pattern: codebook groups generate one after the
    other, each group flattened over time
    (reference: codebook_patterns.py:527-544 MusicLMPattern)."""

    n_q: int
    special_token: int
    group_by: int = 2

    def seq_len(self, t: int) -> int:
        return self.n_q * t

    def apply(self, tokens: Array) -> Array:
        b, n_q, t = tokens.shape
        g = self.group_by
        out = jnp.full((b, n_q, n_q * t), self.special_token, tokens.dtype)
        for offset in range(0, n_q, g):
            base = offset * t
            for j in range(g):
                q = offset + j
                pos = base + jnp.arange(t) * g + j
                out = out.at[:, q, pos].set(tokens[:, q])
        return out

    def revert(self, grid: Array) -> Array:
        b, n_q, s = grid.shape
        t = s // n_q
        g = self.group_by
        rows = []
        for offset in range(0, n_q, g):
            base = offset * t
            for j in range(g):
                pos = base + jnp.arange(t) * g + j
                rows.append(grid[:, offset + j, pos])
        return jnp.stack(rows, axis=1)


class AudioLM(nn.Module):
    """Causal LM over (B, n_q, T) token grids with optional conditioning
    (reference: lm.py AudioLanguageModel/AudioLanguageModelWrapper):
    cross-attention tokens, prepended embeddings, and a global vector.
    The same parameters serve the full-sequence training pass and the
    KV-cached incremental decode pass (``step``)."""

    n_quantizers: int = 4
    codebook_size: int = 1024
    dim: int = 256
    depth: int = 4
    num_heads: int = 4
    cross_attn_cond_dim: int = 0
    prepend_cond_dim: int = 0
    global_cond_dim: int = 0
    conformer: bool = False
    backbone_kwargs: Any = None
    dtype: Any = None

    @property
    def special_token(self) -> int:
        return self.codebook_size  # one extra id for pattern padding / BOS

    def _backbone(self):
        # extra ContinuousTransformer knobs pass through unchanged, like
        # the reference backbone's **kwargs (lm_backbone.py:102-120)
        return ContinuousTransformer(
            dim=self.dim, depth=self.depth,
            dim_heads=self.dim // self.num_heads, causal=True,
            cross_attend=self.cross_attn_cond_dim > 0,
            cond_token_dim=self.cross_attn_cond_dim or None,
            global_cond_dim=self.global_cond_dim or None,
            conformer=self.conformer,
            name="backbone", dtype=self.dtype,
            **dict(self.backbone_kwargs or {}))

    def _embed(self, tokens: Array) -> Array:
        emb = 0.0
        for q in range(self.n_quantizers):
            emb = emb + nn.Embed(
                self.codebook_size + 1, self.dim,
                name=f"emb_{q}")(tokens[:, q])
        return emb

    def _heads(self, h: Array) -> Array:
        logits = [nn.Dense(self.codebook_size, name=f"head_{q}",
                           dtype=self.dtype)(h)
                  for q in range(self.n_quantizers)]
        return jnp.stack(logits, axis=1)

    def _prepend(self, prepend_cond: Optional[Array]) -> Optional[Array]:
        if prepend_cond is None:
            return None
        return nn.Dense(self.dim, name="prepend_proj",
                        dtype=self.dtype)(prepend_cond)

    def init_cache(self, batch: int, max_len: int):
        """KV caches for incremental decode; max_len must cover prepend
        tokens + generated steps (plain helper: allocates zeros only --
        shapes computed inline because named submodules cannot be
        constructed outside init/apply)."""
        dim_heads = self.dim // self.num_heads
        z = lambda: jnp.zeros((batch, self.num_heads, max_len, dim_heads))
        return tuple((z(), z()) for _ in range(self.depth))

    @nn.compact
    def __call__(self, tokens: Array,
                 cross_attn_cond: Optional[Array] = None,
                 cross_attn_mask: Optional[Array] = None,
                 prepend_cond: Optional[Array] = None,
                 global_cond: Optional[Array] = None,
                 cache=None, cache_index=None):
        """Full pass: tokens (B, n_q, S) in delayed layout -> logits
        (B, n_q, S, codebook_size); position s sees s' < s (+ prepended
        conditioning). With ``cache``/``cache_index``: incremental decode
        of tokens at absolute positions cache_index..; returns
        (logits, new_cache). Pass ``prepend_cond`` on the prefill call
        only -- its embeddings occupy the first cache slots."""
        n_prep = 0 if prepend_cond is None else prepend_cond.shape[1]
        if cache is not None:
            x = self._embed(tokens)
            if n_prep:
                x = jnp.concatenate([self._prepend(prepend_cond), x],
                                    axis=1)
            h, new_cache = self._backbone()(
                x, context=cross_attn_cond, context_mask=cross_attn_mask,
                global_cond=global_cond, cache=cache,
                cache_index=cache_index)
            if n_prep:
                h = h[:, n_prep:]
            return self._heads(h), new_cache
        h = self._backbone()(
            self._embed(tokens),
            prepend_embeds=self._prepend(prepend_cond),
            context=cross_attn_cond, context_mask=cross_attn_mask,
            global_cond=global_cond)
        if n_prep:
            h = h[:, n_prep:]
        return self._heads(h)


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


def _mask_top_k(logits: Array, k: int) -> Array:
    vals = jax.lax.top_k(logits, k)[0]
    thresh = vals[..., -1:]
    return jnp.where(logits >= thresh, logits, -jnp.inf)


def _mask_top_p(logits: Array, p: float) -> Array:
    """Nucleus filtering: keep the smallest prefix of the sorted
    distribution whose mass reaches p (reference: lm.py sample_top_p)."""
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < p  # exclusive prefix mass
    # unsort the keep mask
    inv = jnp.argsort(sort_idx, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    return jnp.where(keep, logits, -jnp.inf)


def _sample_tokens(key: Array, logits: Array, temperature: float,
                   top_k: int, top_p: float) -> Array:
    """Temperature / top-k / top-p token sampling over the last axis
    (reference: lm.py:327-341). temperature <= 0 -> greedy argmax."""
    if temperature <= 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p > 0.0:
        logits = _mask_top_p(logits, top_p)
    elif top_k > 0:
        logits = _mask_top_k(logits, min(top_k, logits.shape[-1]))
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def lm_generate(model: AudioLM, params, key: Array, batch: int,
                length: int, *, temperature: float = 1.0,
                top_k: int = 0, top_p: float = 0.0,
                cfg_scale: float = 1.0,
                cross_attn_cond: Optional[Array] = None,
                cross_attn_mask: Optional[Array] = None,
                prepend_cond: Optional[Array] = None,
                global_cond: Optional[Array] = None,
                pattern: Optional[DelayPattern] = None) -> Array:
    """KV-cached autoregressive sampling: ONE prefill + a lax.scan of
    single-token decode steps (O(T) network work instead of the O(T^2)
    full-recompute loop; replaces the reference's per-token cache
    bookkeeping, lm.py:343-449). Classifier-free guidance doubles the
    batch with zeroed conditioning (reference: lm.py:290-318). Returns
    (B, n_q, length) tokens in canonical layout."""
    pattern = pattern or DelayPattern(model.n_quantizers,
                                      model.special_token)
    if hasattr(pattern, "seq_len"):
        steps = pattern.seq_len(length)
    else:
        steps = length + pattern.extra_steps
    n_q = model.n_quantizers
    n_prep = 0 if prepend_cond is None else prepend_cond.shape[1]
    use_cfg = cfg_scale != 1.0 and (
        cross_attn_cond is not None or prepend_cond is not None
        or global_cond is not None)

    def dup(a):
        return None if a is None else jnp.concatenate([a, a], axis=0)

    def null_pair(a):
        return None if a is None else jnp.concatenate(
            [a, jnp.zeros_like(a)], axis=0)

    if use_cfg:
        net_batch = 2 * batch
        cross_attn_cond = null_pair(cross_attn_cond)
        cross_attn_mask = dup(cross_attn_mask)
        prepend_cond = null_pair(prepend_cond)
        global_cond = null_pair(global_cond)
    else:
        net_batch = batch

    cache = model.init_cache(net_batch, n_prep + steps + 1)

    def blend(logits):
        if not use_cfg:
            return logits
        cond, uncond = jnp.split(logits, 2, axis=0)
        return uncond + (cond - uncond) * cfg_scale

    def net(tokens, cache, pos, prepend=None):
        toks = dup(tokens) if use_cfg else tokens
        logits, cache = model.apply(
            params, toks, cross_attn_cond=cross_attn_cond,
            cross_attn_mask=cross_attn_mask, prepend_cond=prepend,
            global_cond=global_cond, cache=cache, cache_index=pos)
        return blend(logits[:, :, -1]), cache

    # prefill: prepend conditioning + BOS in one pass
    bos = jnp.full((batch, n_q, 1), model.special_token, jnp.int32)
    key, sub = jax.random.split(key)
    logits0, cache = net(bos, cache, jnp.zeros((), jnp.int32),
                         prepend=prepend_cond)
    tok0 = _sample_tokens(sub, logits0, temperature, top_k, top_p)

    out = jnp.full((batch, n_q, steps), model.special_token, jnp.int32)
    out = jax.lax.dynamic_update_slice_in_dim(
        out, tok0[..., None], 0, axis=2)

    def step(carry, i):
        prev, cache, out, k = carry
        k, sub = jax.random.split(k)
        logits, cache = net(prev[..., None], cache, n_prep + 1 + i)
        tok = _sample_tokens(sub, logits, temperature, top_k, top_p)
        out = jax.lax.dynamic_update_slice_in_dim(
            out, tok[..., None], i + 1, axis=2)
        return (tok, cache, out, k), None

    if steps > 1:
        (_, _, out, _), _ = jax.lax.scan(
            step, (tok0, cache, out, key), jnp.arange(steps - 1))
    # pattern-invalid positions carry the special token by construction
    delayed = jnp.where(_pattern_valid_mask(pattern, batch, length), out,
                        model.special_token)
    return pattern.revert(delayed)


def _pattern_valid_mask(pattern, batch: int, length: int) -> Array:
    """(B, n_q, seq) mask of positions that carry real tokens in the
    pattern layout (reference: pattern.build_pattern_sequence masks).

    Derived from the pattern's own ``apply``: a marker grid of canonical
    shape (1, n_q, length) is laid out by the pattern, and every position
    still holding the fill value (``special_token``) is invalid. This
    stays correct for any pattern -- per-codebook delays, flattening,
    coarse-first -- rather than hardcoding the default delay layout."""
    marker = pattern.special_token - 1
    grid = jnp.full((1, pattern.n_q, length), marker, jnp.int32)
    valid = pattern.apply(grid) == marker
    return jnp.broadcast_to(valid, (batch,) + valid.shape[1:])
