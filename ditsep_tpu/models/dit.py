"""Diffusion transformer (DiT) over latent sequences.

TPU-native re-design of the stable-audio-tools DiffusionTransformer
(reference: src/stable_audio_tools/models/dit.py:12-428): io projections,
Fourier timestep embedding, cross-attention / prepend / global (adaLN)
conditioning, classifier-free guidance with optional rescaling.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.transformer import ContinuousTransformer

Array = jax.Array


class FourierFeatures(nn.Module):
    """(reference: src/stable_audio_tools/models/blocks.py:85-94)."""

    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # trainable, exactly like the reference's nn.Parameter
        # (reference: blocks.py:85-94)
        w = self.param("weight", nn.initializers.normal(self.std),
                       (self.out_features // 2, x.shape[-1]))
        f = 2 * math.pi * x @ w.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1)


class _MLPEmbed(nn.Module):
    out_dim: int
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.out_dim, use_bias=self.use_bias, name="dense_0",
                     dtype=self.dtype)(x)
        return nn.Dense(self.out_dim, use_bias=self.use_bias,
                        name="dense_1", dtype=self.dtype)(jax.nn.silu(h))


class DiffusionTransformer(nn.Module):
    """(reference: dit.py:12-428). Input/output (B, C, T) channel-first."""

    io_channels: int = 32
    patch_size: int = 1
    embed_dim: int = 768
    cond_token_dim: int = 0
    project_cond_tokens: bool = True
    global_cond_dim: int = 0
    project_global_cond: bool = True
    input_concat_dim: int = 0
    prepend_cond_dim: int = 0
    depth: int = 12
    num_heads: int = 8
    global_cond_type: str = "prepend"  # 'prepend' | 'adaLN'
    diffusion_objective: str = "v"
    qk_norm: str = "none"
    sliding_window: Tuple[int, int] = (-1, -1)
    # REFERENCE QUIRK: the reference accepts cross_attn_cond_mask /
    # prepend_cond_mask / mask but none of them ever reach the attention
    # kernels — dit.py:306-309 hard-disables the cross-attn mask, and
    # ContinuousTransformer.forward builds the combined prepend+input key
    # mask then drops it on the floor (transformer.py:885-889 forwards
    # only rotary_pos_emb/global_cond to the layers). Every shipped
    # stable-audio checkpoint was trained that way, so mask-ignoring is
    # the parity default; apply_cond_masks=True enables real key masking
    # (our ContinuousTransformer supports it) for NEW trainings.
    apply_cond_masks: bool = False
    dtype: Any = None

    def __call__(self, x: Array, t: Array, *,
                 cross_attn_cond: Optional[Array] = None,
                 cross_attn_cond_mask: Optional[Array] = None,
                 negative_cross_attn_cond: Optional[Array] = None,
                 negative_cross_attn_mask: Optional[Array] = None,
                 input_concat_cond: Optional[Array] = None,
                 global_embed: Optional[Array] = None,
                 prepend_cond: Optional[Array] = None,
                 prepend_cond_mask: Optional[Array] = None,
                 cfg_scale: float = 1.0,
                 cfg_dropout_prob: float = 0.0,
                 cfg_interval: Tuple[float, float] = (0.0, 1.0),
                 scale_phi: float = 0.0,
                 mask: Optional[Array] = None,
                 rngs_key: Optional[Array] = None) -> Array:
        if cfg_dropout_prob > 0.0:
            if rngs_key is None:
                raise ValueError(
                    "cfg_dropout_prob > 0 requires rngs_key — training "
                    "without it would silently skip conditioning dropout "
                    "and degrade CFG")
            # CFG dropout: null out conditioning rows at random, with an
            # independent draw for cross-attn and prepend conditioning
            # (reference: dit.py:312-323 draws a fresh bernoulli per kind)
            k_cross, k_prep = jax.random.split(rngs_key)
            if cross_attn_cond is not None:
                keep = jax.random.uniform(
                    k_cross, (x.shape[0], 1, 1)) >= cfg_dropout_prob
                cross_attn_cond = jnp.where(keep, cross_attn_cond, 0.0)
            if prepend_cond is not None:
                keep = jax.random.uniform(
                    k_prep, (x.shape[0], 1, 1)) >= cfg_dropout_prob
                prepend_cond = jnp.where(keep, prepend_cond, 0.0)

        # CFG triggers on cross-attn / prepend conditioning only — a bare
        # global embed runs the plain conditioned pass (reference:
        # dit.py:333; the uncond half REUSES the global embed rather than
        # nulling it, dit.py:337-341)
        if cfg_scale != 1.0 and (cross_attn_cond is not None
                                 or prepend_cond is not None):
            # batched CFG: run cond and uncond in one doubled batch
            # (reference: dit.py:330-420)
            def dbl(a):
                return None if a is None else jnp.concatenate([a, a], 0)

            null_cross = None
            if cross_attn_cond is not None:
                if negative_cross_attn_cond is not None:
                    null_cross = negative_cross_attn_cond
                    if negative_cross_attn_mask is not None:
                        # masked-out negative tokens fall back to the null
                        # (zero) embed (reference: dit.py:348-355)
                        null_cross = jnp.where(
                            negative_cross_attn_mask[..., None].astype(bool),
                            null_cross, 0.0)
                else:
                    null_cross = jnp.zeros_like(cross_attn_cond)
            cc = (jnp.concatenate([cross_attn_cond, null_cross], 0)
                  if cross_attn_cond is not None else None)
            pc = (jnp.concatenate(
                [prepend_cond, jnp.zeros_like(prepend_cond)], 0)
                if prepend_cond is not None else None)
            out = self._forward(
                dbl(x), dbl(t), cross_attn_cond=cc,
                cross_attn_cond_mask=dbl(cross_attn_cond_mask),
                input_concat_cond=dbl(input_concat_cond),
                global_embed=dbl(global_embed),
                prepend_cond=pc, prepend_cond_mask=dbl(prepend_cond_mask),
                mask=dbl(mask))
            cond_out, uncond_out = jnp.split(out, 2, axis=0)
            cfg_out = uncond_out + (cond_out - uncond_out) * cfg_scale
            if scale_phi != 0.0:
                # rescale std over the CHANNEL axis only (reference:
                # dit.py:404-406 std(dim=1, keepdim=True) on (B, C, T))
                cond_std = jnp.std(cond_out, axis=1, keepdims=True)
                cfg_std = jnp.std(cfg_out, axis=1, keepdims=True)
                rescaled = cfg_out * (cond_std / jnp.clip(cfg_std,
                                                          min=1e-8))
                cfg_out = scale_phi * rescaled + (1 - scale_phi) * cfg_out
            # guidance only while sigma(t[0]) is inside the interval;
            # outside it the plain conditioned output passes through
            # (reference: dit.py:326-333 always performs this compare, so
            # we do too — for t outside [0,1] (rectified-flow extensions)
            # even the default (0.0, 1.0) interval can gate off). cond_out
            # is already computed in the doubled batch, so the gate is a
            # free select — no data-dependent control flow under jit; the
            # jit trade-off is that gated-off steps still pay the doubled
            # batch (2x the reference's cost on steps outside the
            # interval), which only matters for samplers that spend most
            # steps outside it.
            sigma = (jnp.sin(t[0] * math.pi / 2)
                     if self.diffusion_objective == "v" else t[0])
            in_int = ((cfg_interval[0] <= sigma)
                      & (sigma <= cfg_interval[1]))
            return jnp.where(in_int, cfg_out, cond_out)
        return self._forward(
            x, t, cross_attn_cond=cross_attn_cond,
            cross_attn_cond_mask=cross_attn_cond_mask,
            input_concat_cond=input_concat_cond, global_embed=global_embed,
            prepend_cond=prepend_cond, prepend_cond_mask=prepend_cond_mask,
            mask=mask)

    @nn.compact
    def _forward(self, x, t, *, cross_attn_cond=None,
                 cross_attn_cond_mask=None, input_concat_cond=None,
                 global_embed=None, prepend_cond=None,
                 prepend_cond_mask=None, mask=None):
        embed_dim = self.embed_dim
        if cross_attn_cond is not None:
            ce_dim = embed_dim if self.project_cond_tokens \
                else self.cond_token_dim
            cross_attn_cond = _MLPEmbed(
                ce_dim, use_bias=False, name="to_cond_embed",
                dtype=self.dtype)(cross_attn_cond)
        if global_embed is not None:
            ge_dim = embed_dim if self.project_global_cond \
                else self.global_cond_dim
            global_embed = _MLPEmbed(
                ge_dim, use_bias=False, name="to_global_embed",
                dtype=self.dtype)(global_embed)

        prepend_inputs = None
        prepend_mask = None
        prepend_length = 0
        if prepend_cond is not None:
            prepend_inputs = _MLPEmbed(
                embed_dim, use_bias=False, name="to_prepend_embed",
                dtype=self.dtype)(prepend_cond)
            prepend_mask = prepend_cond_mask

        if input_concat_cond is not None:
            if input_concat_cond.shape[2] != x.shape[2]:
                reps = -(-x.shape[2] // input_concat_cond.shape[2])
                input_concat_cond = jnp.repeat(
                    input_concat_cond, reps, axis=2)[:, :, :x.shape[2]]
            x = jnp.concatenate([x, input_concat_cond], axis=1)

        t_feat = FourierFeatures(256, name="timestep_features")(t[:, None])
        timestep_embed = _MLPEmbed(embed_dim, name="to_timestep_embed",
                                   dtype=self.dtype)(t_feat)
        global_embed = (timestep_embed if global_embed is None
                        else global_embed + timestep_embed)

        if self.global_cond_type == "prepend":
            ge = global_embed[:, None, :]
            if prepend_inputs is None:
                prepend_inputs = ge
                prepend_mask = jnp.ones((x.shape[0], 1), bool)
            else:
                # prepend_cond without a mask means all-valid (the
                # reference CRASHES here — dit.py:210 cat(None, ones) —
                # so prepend_cond_mask is effectively mandatory there;
                # we accept the omission)
                if prepend_mask is None:
                    prepend_mask = jnp.ones(prepend_inputs.shape[:2], bool)
                prepend_inputs = jnp.concatenate([prepend_inputs, ge], 1)
                prepend_mask = jnp.concatenate(
                    [prepend_mask, jnp.ones((x.shape[0], 1), bool)], axis=1)
            prepend_length = prepend_inputs.shape[1]
            adaln_cond = None
        else:  # adaLN
            adaln_cond = global_embed
            if prepend_inputs is not None:
                prepend_length = prepend_inputs.shape[1]

        dim_in = x.shape[1]
        pre = nn.Conv(dim_in, (1,), use_bias=False,
                      kernel_init=nn.initializers.zeros,
                      name="preprocess_conv", dtype=self.dtype)
        x = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        x = pre(x) + x
        if self.patch_size > 1:
            b, tt, c = x.shape
            x = x.reshape(b, tt // self.patch_size, c * self.patch_size)

        if not self.apply_cond_masks:
            # parity default: masks never reach the kernels (see the
            # apply_cond_masks field comment for the reference citations)
            prepend_mask = None
            cross_attn_cond_mask = None
            mask = None
        out = ContinuousTransformer(
            dim=embed_dim, depth=self.depth,
            dim_heads=embed_dim // self.num_heads,
            dim_in=dim_in * self.patch_size,
            dim_out=self.io_channels * self.patch_size,
            cross_attend=self.cond_token_dim > 0,
            cond_token_dim=(embed_dim if self.project_cond_tokens
                            else self.cond_token_dim)
            if self.cond_token_dim > 0 else None,
            global_cond_dim=(embed_dim
                             if self.global_cond_type == "adaLN" else None),
            qk_norm=self.qk_norm, sliding_window=tuple(self.sliding_window),
            name="transformer", dtype=self.dtype,
        )(x, prepend_embeds=prepend_inputs, prepend_mask=prepend_mask,
          context=cross_attn_cond, context_mask=cross_attn_cond_mask,
          global_cond=adaln_cond, mask=mask)

        if self.patch_size > 1:
            b, tt, c = out.shape
            out = out.reshape(b, tt * self.patch_size,
                              c // self.patch_size)
        out = jnp.swapaxes(out, 1, 2)
        if prepend_length:  # drop prepend tokens from the time axis
            out = out[:, :, prepend_length:]
        post = nn.Conv(self.io_channels, (1,), use_bias=False,
                       kernel_init=nn.initializers.zeros,
                       name="postprocess_conv", dtype=self.dtype)
        out_t = jnp.swapaxes(out, 1, 2)
        out = jnp.swapaxes(post(out_t), 1, 2) + out
        return out
