"""Continuous transformer stack: RoPE, qk-norm attention, GLU feed-forward,
adaLN global conditioning, sliding-window masks.

TPU-native re-design of the stable-audio-tools transformer
(reference: src/stable_audio_tools/models/transformer.py:28-899). Attention
is plain jnp einsum softmax -- XLA fuses it and, at the audio sequence
lengths this framework sees (latent rates of ~4 Hz), flash-style tiling
buys nothing; sliding windows become additive band masks instead of the
reference's flash-attn kernel windows.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def rotary_freqs(seq_len: int, rot_dim: int, base: float = 10000.0,
                 interpolation_factor: float = 1.0) -> Array:
    """(seq, rot_dim) rotary angle table (reference: transformer.py:92-145).
    rot_dim counts the rotated feature dims (freqs duplicated across the
    two halves)."""
    half = rot_dim // 2
    inv_freq = 1.0 / (base ** (np.arange(0, rot_dim, 2) / rot_dim))
    t = np.arange(seq_len, dtype=np.float64) / interpolation_factor
    freqs = np.einsum("i,j->ij", t, inv_freq)
    return jnp.asarray(np.concatenate([freqs, freqs], axis=-1), jnp.float32)


def _rotate_half(x: Array) -> Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(t: Array, freqs: Array) -> Array:
    """Partial rotary embedding (reference: transformer.py:148-174).
    t: (..., seq, dim_head); freqs: (seq, rot_dim <= dim_head)."""
    rot_dim = freqs.shape[-1]
    seq = t.shape[-2]
    freqs = freqs[-seq:]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    t_rot = t_rot * jnp.cos(freqs) + _rotate_half(t_rot) * jnp.sin(freqs)
    return jnp.concatenate([t_rot, t_pass], axis=-1)


def sliding_window_mask(q_len: int, k_len: int,
                        window: Tuple[int, int]) -> Optional[Array]:
    """Band mask: key j visible to query i iff -window[0] <= j - i <=
    window[1] (the flash-attn sliding_window convention the reference
    passes, reference: transformer.py attn_kwargs sliding_window)."""
    left, right = window
    if left == -1 and right == -1:
        return None
    i = jnp.arange(q_len)[:, None]
    j = jnp.arange(k_len)[None, :]
    ok = jnp.ones((q_len, k_len), bool)
    if left != -1:
        ok = ok & (j - i >= -left)
    if right != -1:
        ok = ok & (j - i <= right)
    return ok


class LayerScale(nn.Module):
    """(reference: transformer.py:204-212)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (x.shape[-1],))
        return x * gamma


class FeedForward(nn.Module):
    """SwiGLU feed-forward (reference: transformer.py:214-288)."""

    dim_out: Optional[int] = None
    mult: float = 4.0
    no_bias: bool = False
    glu: bool = True
    zero_init_output: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        inner = int(dim * self.mult)
        dim_out = self.dim_out or dim
        out_init = (nn.initializers.zeros if self.zero_init_output
                    else nn.initializers.lecun_normal())
        if self.glu:
            h = nn.Dense(inner * 2, use_bias=not self.no_bias,
                         name="proj_in", dtype=self.dtype)(x)
            a, gate = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.silu(gate)
        else:
            h = jax.nn.silu(nn.Dense(inner, use_bias=not self.no_bias,
                                     name="proj_in", dtype=self.dtype)(x))
        return nn.Dense(dim_out, use_bias=not self.no_bias,
                        kernel_init=out_init, name="proj_out",
                        dtype=self.dtype)(h)


class Attention(nn.Module):
    """Multi-head attention with optional qk-norm, RoPE, causal /
    sliding-window masks, cross-attention
    (reference: transformer.py:290-598)."""

    dim: int
    dim_heads: int = 64
    dim_context: Optional[int] = None
    dim_out: Optional[int] = None  # output width; defaults to dim
    causal: bool = False
    zero_init_output: bool = True
    qk_norm: str = "none"
    sliding_window: Tuple[int, int] = (-1, -1)
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 rotary_pos_emb: Optional[Array] = None,
                 cache: Optional[Tuple[Array, Array]] = None,
                 cache_index: Optional[Array] = None):
        """Standard call returns the attended output. With ``cache`` (a
        (k_cache, v_cache) pair of (B, H, S_max, Dh) arrays) and
        ``cache_index`` (scalar absolute position of x[0]), runs
        incremental decoding: new K/V are written at cache_index.. and
        attention reads the whole cache with positions > the current
        query masked; returns (out, new_cache). One jitted step program +
        a lax.scan replaces the reference's per-token cache bookkeeping
        (reference: lm_backbone.py use_generation_cache)."""
        h = self.dim // self.dim_heads
        out_init = (nn.initializers.zeros if self.zero_init_output
                    else nn.initializers.lecun_normal())
        if self.dim_context is not None:
            # project context K/V to the query width (the reference keeps
            # dim_context and repeats KV heads, transformer.py:305-316;
            # projecting is equivalent up to a reparameterization and
            # avoids the divisibility constraint)
            q = nn.Dense(self.dim, use_bias=False, name="to_q",
                         dtype=self.dtype)(x)
            kv = nn.Dense(self.dim * 2, use_bias=False,
                          name="to_kv", dtype=self.dtype)(context)
            k, v = jnp.split(kv, 2, axis=-1)
        else:
            qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv",
                           dtype=self.dtype)(x)
            q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, -1, self.dim_heads).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))

        if self.qk_norm == "ln":
            q = nn.LayerNorm(epsilon=1e-6, name="q_norm",
                             dtype=self.dtype)(q)
            k = nn.LayerNorm(epsilon=1e-6, name="k_norm",
                             dtype=self.dtype)(k)
        elif self.qk_norm == "l2":
            q = q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True),
                             min=1e-12)
            k = k / jnp.clip(jnp.linalg.norm(k, axis=-1, keepdims=True),
                             min=1e-12)

        if cache is not None:
            assert self.dim_context is None, "cache is for self-attention"
            assert cache_index is not None
            qn = q.shape[2]
            if rotary_pos_emb is not None:
                freqs = jax.lax.dynamic_slice_in_dim(
                    rotary_pos_emb, cache_index, qn, axis=0)
                q = apply_rotary_pos_emb(q, freqs)
                k = apply_rotary_pos_emb(k, freqs)
            k_cache, v_cache = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, k.astype(k_cache.dtype), cache_index, axis=2)
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, v.astype(v_cache.dtype), cache_index, axis=2)
            scale = self.dim_heads ** -0.5
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache) * scale
            neg = jnp.finfo(logits.dtype).min
            qpos = cache_index + jnp.arange(qn)[:, None]
            kpos = jnp.arange(k_cache.shape[2])[None, :]
            logits = jnp.where(kpos <= qpos, logits, neg)
            attn = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v_cache)
            out = out.transpose(0, 2, 1, 3).reshape(
                x.shape[0], x.shape[1], -1)
            out = nn.Dense(self.dim_out or self.dim, use_bias=False,
                           kernel_init=out_init,
                           name="to_out", dtype=self.dtype)(out)
            return out, (k_cache, v_cache)

        if rotary_pos_emb is not None and self.dim_context is None:
            q = apply_rotary_pos_emb(q, rotary_pos_emb)
            k = apply_rotary_pos_emb(k, rotary_pos_emb)

        scale = self.dim_heads ** -0.5
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        neg = jnp.finfo(logits.dtype).min
        qn, kn = logits.shape[-2], logits.shape[-1]
        if self.causal:
            causal_ok = jnp.tril(jnp.ones((qn, kn), bool), kn - qn)
            logits = jnp.where(causal_ok, logits, neg)
        band = sliding_window_mask(qn, kn, tuple(self.sliding_window))
        if band is not None:
            logits = jnp.where(band, logits, neg)
        if mask is not None:  # (B, k) key padding mask
            logits = jnp.where(mask[:, None, None, :], logits, neg)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], x.shape[1], -1)
        out = nn.Dense(self.dim_out or self.dim, use_bias=False,
                       kernel_init=out_init,
                       name="to_out", dtype=self.dtype)(out)
        if mask is not None and self.dim_context is None:
            # self-attention also zeroes the branch output at masked QUERY
            # positions (reference: transformer.py:594-596 masked_fill on
            # `mask`, which cross-attn calls never pass)
            out = jnp.where(mask[:, :, None], out, 0.0)
        return out


class ConformerModule(nn.Module):
    """Lightweight conformer conv block (reference:
    transformer.py:600-635)."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dim = x.shape[-1]
        h = nn.LayerNorm(name="in_norm", dtype=self.dtype)(x)
        h = nn.Dense(dim, name="pointwise_1", dtype=self.dtype)(h)
        a, gate = jnp.split(nn.Dense(2 * dim, name="glu",
                                     dtype=self.dtype)(h), 2, -1)
        h = a * jax.nn.sigmoid(gate)
        h = nn.Conv(dim, (17,), feature_group_count=dim, padding="SAME",
                    name="depthwise", dtype=self.dtype)(h)
        h = nn.GroupNorm(num_groups=1, name="mid_norm", dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        return nn.Dense(dim, name="pointwise_2", dtype=self.dtype)(h)


class TransformerBlock(nn.Module):
    """Pre-norm block with optional adaLN global conditioning
    (reference: transformer.py:637-764)."""

    dim: int
    dim_heads: int = 64
    cross_attend: bool = False
    dim_context: Optional[int] = None
    global_cond_dim: Optional[int] = None
    causal: bool = False
    zero_init_branch_outputs: bool = True
    conformer: bool = False
    remove_norms: bool = False
    layer_scale: bool = False
    qk_norm: str = "none"
    sliding_window: Tuple[int, int] = (-1, -1)
    ff_mult: float = 4.0
    norm_eps: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 global_cond: Optional[Array] = None,
                 mask: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 rotary_pos_emb: Optional[Array] = None,
                 cache: Optional[Tuple[Array, Array]] = None,
                 cache_index: Optional[Array] = None):
        zero_init = self.zero_init_branch_outputs and not self.layer_scale
        new_cache = None

        def run_self_attn(attn_mod, h):
            nonlocal new_cache
            if cache is None:
                return attn_mod(h, mask=mask, rotary_pos_emb=rotary_pos_emb)
            out, new_cache = attn_mod(h, rotary_pos_emb=rotary_pos_emb,
                                      cache=cache, cache_index=cache_index)
            return out

        def norm(name):
            if self.remove_norms:
                return lambda t: t
            return nn.LayerNorm(epsilon=self.norm_eps, name=name,
                                dtype=self.dtype)

        def scale(name):
            if self.layer_scale:
                return LayerScale(name=name)
            return lambda t: t

        self_attn = Attention(
            self.dim, dim_heads=self.dim_heads, causal=self.causal,
            zero_init_output=zero_init, qk_norm=self.qk_norm,
            sliding_window=tuple(self.sliding_window), name="self_attn",
            dtype=self.dtype)
        ff = FeedForward(mult=self.ff_mult, zero_init_output=zero_init,
                         name="ff", dtype=self.dtype)

        if self.global_cond_dim and global_cond is not None:
            ssg = self.param(
                "to_scale_shift_gate",
                nn.initializers.normal(self.dim ** -0.5), (6 * self.dim,))
            parts = jnp.split((ssg + global_cond)[:, None, :], 6, axis=-1)
            scale_self, shift_self, gate_self, scale_ff, shift_ff, gate_ff \
                = parts
            res = x
            h = norm("pre_norm")(x)
            h = h * (1 + scale_self) + shift_self
            h = run_self_attn(self_attn, h)
            h = h * jax.nn.sigmoid(1 - gate_self)
            x = res + scale("self_attn_scale")(h)
            if context is not None and self.cross_attend:
                x = x + scale("cross_attn_scale")(Attention(
                    self.dim, dim_heads=self.dim_heads,
                    dim_context=self.dim_context or context.shape[-1],
                    zero_init_output=zero_init, qk_norm=self.qk_norm,
                    name="cross_attn", dtype=self.dtype)(
                    norm("cross_attend_norm")(x), context=context,
                    mask=context_mask))
            if self.conformer:
                x = x + scale("conformer_scale")(
                    ConformerModule(name="conformer", dtype=self.dtype)(x))
            res = x
            h = norm("ff_norm")(x)
            h = h * (1 + scale_ff) + shift_ff
            h = ff(h)
            h = h * jax.nn.sigmoid(1 - gate_ff)
            x = res + scale("ff_scale")(h)
        else:
            x = x + scale("self_attn_scale")(run_self_attn(
                self_attn, norm("pre_norm")(x)))
            if context is not None and self.cross_attend:
                x = x + scale("cross_attn_scale")(Attention(
                    self.dim, dim_heads=self.dim_heads,
                    dim_context=self.dim_context or context.shape[-1],
                    zero_init_output=zero_init, qk_norm=self.qk_norm,
                    name="cross_attn", dtype=self.dtype)(
                    norm("cross_attend_norm")(x), context=context,
                    mask=context_mask))
            if self.conformer:
                x = x + scale("conformer_scale")(
                    ConformerModule(name="conformer", dtype=self.dtype)(x))
            x = x + scale("ff_scale")(ff(norm("ff_norm")(x)))
        if cache is not None:
            return x, new_cache
        return x


class ContinuousTransformer(nn.Module):
    """(reference: transformer.py:766-899)."""

    dim: int
    depth: int
    dim_in: Optional[int] = None
    dim_out: Optional[int] = None
    dim_heads: int = 64
    cross_attend: bool = False
    cond_token_dim: Optional[int] = None
    final_cross_attn_ix: int = -1
    global_cond_dim: Optional[int] = None
    causal: bool = False
    rotary_pos_emb: bool = True
    zero_init_branch_outputs: bool = True
    conformer: bool = False
    qk_norm: str = "none"
    sliding_window: Tuple[int, int] = (-1, -1)
    ff_mult: float = 4.0
    dtype: Any = None

    def init_cache(self, batch: int, max_len: int,
                   dtype=jnp.float32) -> Tuple:
        """Per-layer (k, v) KV caches of static length ``max_len`` for
        incremental decoding (carry them through a lax.scan)."""
        h = self.dim // self.dim_heads
        z = lambda: jnp.zeros((batch, h, max_len, self.dim_heads), dtype)
        return tuple((z(), z()) for _ in range(self.depth))

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None,
                 prepend_embeds: Optional[Array] = None,
                 prepend_mask: Optional[Array] = None,
                 global_cond: Optional[Array] = None,
                 context: Optional[Array] = None,
                 context_mask: Optional[Array] = None,
                 return_info: bool = False,
                 cache: Optional[Tuple] = None,
                 cache_index: Optional[Array] = None):
        batch, seq = x.shape[:2]
        if self.dim_in is not None:
            x = nn.Dense(self.dim, use_bias=False, name="project_in",
                         dtype=self.dtype)(x)
        if prepend_embeds is not None:
            assert prepend_embeds.shape[-1] == x.shape[-1]
            plen = prepend_embeds.shape[1]
            x = jnp.concatenate([prepend_embeds, x], axis=1)
            if prepend_mask is not None or mask is not None:
                mask = (mask if mask is not None
                        else jnp.ones((batch, seq), bool))
                prepend_mask = (prepend_mask if prepend_mask is not None
                                else jnp.ones((batch, plen), bool))
                mask = jnp.concatenate([prepend_mask, mask], axis=-1)

        rope = None
        if self.rotary_pos_emb:
            rot_dim = min(max(self.dim_heads // 2, 32), self.dim_heads)
            # decode: the table must span absolute cache positions
            rope_len = (cache[0][0].shape[2] if cache is not None
                        else x.shape[1])
            rope = rotary_freqs(rope_len, rot_dim)

        if global_cond is not None and self.global_cond_dim:
            h = nn.Dense(self.dim, name="global_embed_in",
                         dtype=self.dtype)(global_cond)
            global_cond = nn.Dense(self.dim * 6, name="global_embed_out",
                                   dtype=self.dtype)(jax.nn.silu(h))

        info = {"hidden_states": []}
        new_caches = []
        for i in range(self.depth):
            should_cross = self.cross_attend and (
                self.final_cross_attn_ix == -1
                or i <= self.final_cross_attn_ix)
            block = TransformerBlock(
                self.dim, dim_heads=self.dim_heads,
                cross_attend=should_cross,
                dim_context=self.cond_token_dim,
                global_cond_dim=(self.dim if global_cond is not None
                                 else None),
                causal=self.causal,
                zero_init_branch_outputs=self.zero_init_branch_outputs,
                conformer=self.conformer, qk_norm=self.qk_norm,
                sliding_window=tuple(self.sliding_window),
                ff_mult=self.ff_mult, name=f"layer_{i}", dtype=self.dtype,
            )
            if cache is not None:
                x, c = block(x, context=context, global_cond=global_cond,
                             context_mask=context_mask,
                             rotary_pos_emb=rope, cache=cache[i],
                             cache_index=cache_index)
                new_caches.append(c)
            else:
                x = block(x, context=context, global_cond=global_cond,
                          mask=mask, context_mask=context_mask,
                          rotary_pos_emb=rope)
            if return_info:
                info["hidden_states"].append(x)

        if self.dim_out is not None:
            x = nn.Dense(self.dim_out, use_bias=False, name="project_out",
                         dtype=self.dtype)(x)
        if cache is not None:
            return x, tuple(new_caches)
        if return_info:
            return x, info
        return x
