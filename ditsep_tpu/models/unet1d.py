"""1-D diffusion U-Net family (the audio-diffusion-pytorch lineage).

TPU-native re-design of the vendored adp UNet stack
(reference: src/stable_audio_tools/models/adp.py:24-1562):

* ``UNet1d``       -- v-objective U-Net with timestep mapping, optional
                      context FEATURES (a global vector summed into the
                      time mapping, adp.py:1172-1191), per-layer context
                      CHANNELS (feature maps concatenated at a given
                      depth, adp.py:1150-1170), cross-attention EMBEDDING
                      tokens with a mask, patching, and skip scaling.
* ``UNetCFG1d``    -- classifier-free guidance: a learned FixedEmbedding
                      null context, random context masking at train time,
                      guidance scale / rescale(phi) / negative embeddings
                      at inference (adp.py:1262-1381).
* ``UNetNCCA1d``   -- noise-channel conditioning augmentation
                      (adp.py:1384-1437).
* ``XUNet1d``      -- the type dispatch factory (adp.py:1443-1453).
* ``NumberEmbedder`` -- learned embedding of raw floats (adp.py:1455-1480).

Design differences from the reference (deliberate, TPU-first): patching
is a reshape of time into channels rather than a strided conv (bijective,
layout-free); upsampling is nearest+conv (the reference's transposed-conv
option aliases and maps poorly to the MXU); CFG runs both branches
through ONE batched network call (the reference's batch_cfg=True path) so
a single program compiles; the dynamic `causal` call-time flag becomes a
static module attribute.
"""
from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ditsep_tpu.models.dit import FourierFeatures
from ditsep_tpu.models.transformer import Attention

Array = jax.Array


def _gn_groups(ch: int, max_groups: int) -> int:
    """Largest group count <= max_groups that divides ch (context-channel
    concatenation makes arbitrary channel counts legal)."""
    g = max(1, min(ch // 4, max_groups))
    while ch % g:
        g -= 1
    return g


def _conv(out_ch, k=3, stride=1, name=None, dtype=None, causal=False):
    if causal:
        pad = [(k - 1, 0)] if stride == 1 else [(k - stride, 0)]
    else:
        pad = [(k // 2, (k - 1) // 2)] if stride == 1 else \
            [((k - stride) // 2, (k - stride + 1) // 2)]
    return nn.Conv(out_ch, (k,), strides=(stride,), padding=pad,
                   name=name, dtype=dtype)


class ResBlock1d(nn.Module):
    """GroupNorm -> SiLU -> conv with FiLM from the mapping vector
    (reference: adp.py:275-334 ResnetBlock1d + MappingToScaleShift)."""

    out_ch: int
    groups: int = 8
    causal: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array]) -> Array:
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=_gn_groups(in_ch, self.groups),
                         epsilon=1e-6, name="norm_0", dtype=self.dtype)(x)
        h = _conv(self.out_ch, name="conv_0", dtype=self.dtype,
                  causal=self.causal)(jax.nn.silu(h))
        h2 = nn.GroupNorm(num_groups=_gn_groups(self.out_ch, self.groups),
                          epsilon=1e-6, name="norm_1", dtype=self.dtype)(h)
        if temb is not None:
            scale_shift = nn.Dense(2 * self.out_ch, name="film",
                                   dtype=self.dtype)(jax.nn.silu(temb))
            scale, shift = jnp.split(scale_shift[:, None, :], 2, axis=-1)
            h2 = h2 * (1 + scale) + shift
        h = _conv(self.out_ch, name="conv_1", dtype=self.dtype,
                  causal=self.causal)(jax.nn.silu(h2))
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1,), name="skip", dtype=self.dtype)(x)
        return (x + h) / math.sqrt(2.0)


class AttnBlock1d(nn.Module):
    """Self-attention + optional cross-attention over context tokens
    (reference: adp.py:545-641 TransformerBlock/Transformer1d)."""

    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, context: Optional[Array] = None,
                 context_mask: Optional[Array] = None) -> Array:
        c = x.shape[-1]
        # inner width = heads * dim_head projected back to the channel
        # width, honoring the attention_heads knob exactly like the
        # reference Transformer1d (adp.py:545-641)
        dim_heads = min(self.dim_head, c)
        inner = self.heads * dim_heads
        h = nn.GroupNorm(num_groups=_gn_groups(c, 32), epsilon=1e-6,
                         name="norm", dtype=self.dtype)(x)
        h = Attention(inner, dim_heads=dim_heads, dim_out=c,
                      causal=self.causal,
                      name="attn", zero_init_output=True,
                      dtype=self.dtype)(h)
        x = x + h
        if context is not None:
            h = nn.GroupNorm(num_groups=_gn_groups(c, 32), epsilon=1e-6,
                             name="cross_norm", dtype=self.dtype)(x)
            h = Attention(inner, dim_heads=dim_heads, dim_out=c,
                          dim_context=context.shape[-1], name="cross_attn",
                          zero_init_output=True, dtype=self.dtype)(
                h, context=context, mask=context_mask)
            x = x + h
        # GLU feedforward (adp.py:532-542)
        h = nn.GroupNorm(num_groups=_gn_groups(c, 32), epsilon=1e-6,
                         name="ff_norm", dtype=self.dtype)(x)
        u, v = jnp.split(nn.Dense(2 * 4 * c, name="ff_in",
                                  dtype=self.dtype)(h), 2, axis=-1)
        h = nn.Dense(c, name="ff_out", dtype=self.dtype,
                     kernel_init=nn.initializers.zeros)(u * jax.nn.gelu(v))
        return x + h


class NumberEmbedder(nn.Module):
    """Learned embedding of raw scalars: fourier features -> MLP
    (reference: adp.py:1455-1480). Accepts any shape; embeds the last
    axis elementwise to `features`."""

    features: int = 256
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        shape = x.shape
        flat = jnp.reshape(jnp.asarray(x, jnp.float32), (-1, 1))
        h = FourierFeatures(self.features, name="fourier")(flat)
        h = nn.Dense(self.features, name="proj", dtype=self.dtype)(h)
        return jnp.reshape(h, shape + (self.features,))


class FixedEmbedding(nn.Module):
    """Learned positional table used as the CFG null context
    (reference: adp.py:1237-1250)."""

    max_length: int
    features: int

    @nn.compact
    def __call__(self, n_tokens: int, batch: int) -> Array:
        assert n_tokens <= self.max_length, (
            f"context length {n_tokens} exceeds max {self.max_length}")
        table = self.param(
            "embedding", nn.initializers.normal(1.0),
            (self.max_length, self.features))
        return jnp.broadcast_to(table[None, :n_tokens],
                                (batch, n_tokens, self.features))


class UNet1d(nn.Module):
    """Core 1-D U-Net. ``__call__(x (B,C,T), t (B,), ...) -> (B,C,T)``.

    Knobs mirror the adp config surface (reference: adp.py:986-1148);
    see module docstring for the deliberate design differences.
    """

    in_channels: int = 2
    channels: int = 64
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (2, 2, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[int] = (0, 0, 1, 1)  # len n_layers(+1 bottleneck)
    patch_size: int = 1
    resnet_groups: int = 8
    out_channels: Optional[int] = None
    use_skip_scale: bool = True
    use_context_time: bool = True
    context_features: Optional[int] = None
    context_channels: Sequence[int] = ()
    context_embedding_features: Optional[int] = None
    attention_heads: int = 8
    attention_features: int = 64
    causal: bool = False
    dtype: Any = None

    def _attns(self):
        """Per-layer attention counts + bottleneck count (the reference
        reads attentions[-1] for the bottleneck, adp.py:1114-1121)."""
        n = len(self.factors)
        a = list(self.attentions) + [0] * (n + 1 - len(self.attentions))
        return a[:n], a[n] if len(self.attentions) > n else a[n - 1]

    @nn.compact
    def __call__(self, x: Array, t: Optional[Array] = None, *,
                 features: Optional[Array] = None,
                 channels_list: Optional[Sequence[Array]] = None,
                 embedding: Optional[Array] = None,
                 embedding_mask: Optional[Array] = None) -> Array:
        n_levels = len(self.factors)
        assert len(self.num_blocks) == n_levels \
            == len(self.multipliers) - 1
        layer_attn, mid_attn = self._attns()

        # context channels: concat feature maps (B, C_i, T_i) at layer i
        ctx = list(self.context_channels)
        ctx += [0] * (n_levels + 1 - len(ctx))
        ch_id = 0

        def take_channels(h, layer):
            nonlocal ch_id
            if ctx[layer] <= 0:
                return h
            assert channels_list is not None, (
                f"context channels declared at layer {layer} but no "
                f"channels_list passed")
            c = channels_list[ch_id]
            ch_id += 1
            assert c.shape[1] == ctx[layer], (
                f"layer {layer} expects {ctx[layer]} context channels, "
                f"got {c.shape[1]}")
            return jnp.concatenate([h, jnp.swapaxes(c, 1, 2)], axis=-1)

        # mapping vector = time embedding (+ features embedding)
        temb = None
        if self.use_context_time or self.context_features:
            items = []
            if self.use_context_time:
                assert t is not None
                te = FourierFeatures(self.channels, name="time_features")(
                    t[:, None])
                items.append(nn.Dense(self.channels * 4, name="to_time",
                                      dtype=self.dtype)(te))
            if self.context_features:
                assert features is not None, "context_features configured"
                items.append(nn.Dense(self.channels * 4, name="to_features",
                                      dtype=self.dtype)(features))
            temb = sum(items)
            temb = nn.Dense(self.channels * 4, name="mapping_0",
                            dtype=self.dtype)(jax.nn.gelu(temb))
            temb = jax.nn.gelu(nn.Dense(self.channels * 4, name="mapping_1",
                                        dtype=self.dtype)(temb))

        h = jnp.swapaxes(x, 1, 2)  # (B, T, C)
        h = take_channels(h, 0)
        # patcher: fold patch_size time steps into channels (bijective)
        p = self.patch_size
        if p > 1:
            b, tt, c = h.shape
            assert tt % p == 0, f"length {tt} not divisible by patch {p}"
            h = h.reshape(b, tt // p, c * p)
        h = _conv(self.channels * self.multipliers[0], name="stem",
                  dtype=self.dtype, causal=self.causal)(h)

        skip_scale = 1.0 / math.sqrt(2.0) if self.use_skip_scale else 1.0
        ctx_tokens = embedding if self.context_embedding_features else None
        skips = [h]
        for i in range(n_levels):
            ch = self.channels * self.multipliers[i + 1]
            for b_i in range(self.num_blocks[i]):
                h = ResBlock1d(ch, groups=self.resnet_groups,
                               causal=self.causal, name=f"down_{i}_{b_i}",
                               dtype=self.dtype)(h, temb)
                if layer_attn[i]:
                    h = AttnBlock1d(heads=self.attention_heads,
                                    dim_head=self.attention_features,
                                    causal=self.causal,
                                    name=f"down_attn_{i}_{b_i}",
                                    dtype=self.dtype)(
                        h, ctx_tokens, embedding_mask)
                skips.append(h)
            f = self.factors[i]
            h = nn.Conv(ch, (f * 2,), strides=(f,),
                        padding=[(f // 2 + f % 2, f // 2)],
                        name=f"down_pool_{i}", dtype=self.dtype)(h)
            h = take_channels(h, i + 1)
            skips.append(h)

        mid_ch = h.shape[-1]
        h = ResBlock1d(mid_ch, groups=self.resnet_groups,
                       causal=self.causal, name="mid_0",
                       dtype=self.dtype)(h, temb)
        if mid_attn:
            h = AttnBlock1d(heads=self.attention_heads,
                            dim_head=self.attention_features,
                            causal=self.causal, name="mid_attn",
                            dtype=self.dtype)(h, ctx_tokens, embedding_mask)
        h = ResBlock1d(mid_ch, groups=self.resnet_groups,
                       causal=self.causal, name="mid_1",
                       dtype=self.dtype)(h, temb)

        for i in reversed(range(n_levels)):
            f = self.factors[i]
            ch = self.channels * self.multipliers[i + 1]
            h = ResBlock1d(ch, groups=self.resnet_groups,
                           causal=self.causal, name=f"up_pool_{i}",
                           dtype=self.dtype)(
                jnp.concatenate([h, skips.pop() * skip_scale], axis=-1),
                temb)
            h = jnp.repeat(h, f, axis=1)  # nearest upsample + conv
            h = _conv(ch, name=f"up_conv_{i}", dtype=self.dtype,
                      causal=self.causal)(h)
            for b_i in range(self.num_blocks[i]):
                h = ResBlock1d(ch, groups=self.resnet_groups,
                               causal=self.causal, name=f"up_{i}_{b_i}",
                               dtype=self.dtype)(
                    jnp.concatenate([h, skips.pop() * skip_scale], axis=-1),
                    temb)
                if layer_attn[i]:
                    h = AttnBlock1d(heads=self.attention_heads,
                                    dim_head=self.attention_features,
                                    causal=self.causal,
                                    name=f"up_attn_{i}_{b_i}",
                                    dtype=self.dtype)(
                        h, ctx_tokens, embedding_mask)
        skip = skips.pop()
        assert not skips
        h = jnp.concatenate([h, skip * skip_scale], axis=-1)
        h = nn.GroupNorm(num_groups=_gn_groups(h.shape[-1], 32),
                         epsilon=1e-6, name="out_norm", dtype=self.dtype)(h)
        out_ch = self.out_channels or self.in_channels
        h = _conv(out_ch * p, name="out_conv", dtype=self.dtype,
                  causal=self.causal)(jax.nn.silu(h))
        if p > 1:  # unpatcher
            b, tt, c = h.shape
            h = h.reshape(b, tt * p, c // p)
        return jnp.swapaxes(h, 1, 2)


class UNetCFG1d(nn.Module):
    """UNet1d with classifier-free guidance (reference: adp.py:1262-1381).

    Train: pass ``embedding_mask_proba`` + ``cfg_key`` to randomly replace
    the context with the learned FixedEmbedding null context.
    Inference: ``embedding_scale != 1`` computes conditioned and
    null-context outputs in ONE batched call and blends them; optional
    ``rescale_cfg``/``scale_phi`` std-rescaling and negative embeddings.
    """

    context_embedding_max_length: int = 64
    context_embedding_features: int = 768
    use_xattn_time: bool = False
    # pass-through UNet1d knobs
    in_channels: int = 2
    channels: int = 64
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (2, 2, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[int] = (0, 0, 1, 1)
    patch_size: int = 1
    resnet_groups: int = 8
    out_channels: Optional[int] = None
    use_skip_scale: bool = True
    context_features: Optional[int] = None
    context_channels: Sequence[int] = ()
    attention_heads: int = 8
    attention_features: int = 64
    causal: bool = False
    dtype: Any = None

    def _unet(self):
        return UNet1d(
            in_channels=self.in_channels, channels=self.channels,
            multipliers=self.multipliers, factors=self.factors,
            num_blocks=self.num_blocks, attentions=self.attentions,
            patch_size=self.patch_size, resnet_groups=self.resnet_groups,
            out_channels=self.out_channels,
            use_skip_scale=self.use_skip_scale,
            context_features=self.context_features,
            context_channels=self.context_channels,
            context_embedding_features=self.context_embedding_features,
            attention_heads=self.attention_heads,
            attention_features=self.attention_features,
            causal=self.causal, name="unet", dtype=self.dtype)

    @nn.compact
    def __call__(self, x: Array, t: Array, *, embedding: Array,
                 embedding_mask: Optional[Array] = None,
                 embedding_scale: float = 1.0,
                 embedding_mask_proba: float = 0.0,
                 cfg_key: Optional[Array] = None,
                 rescale_cfg: bool = False,
                 scale_phi: float = 0.4,
                 negative_embedding: Optional[Array] = None,
                 negative_embedding_mask: Optional[Array] = None,
                 features: Optional[Array] = None,
                 channels_list: Optional[Sequence[Array]] = None) -> Array:
        b = embedding.shape[0]
        max_len = self.context_embedding_max_length + (
            1 if self.use_xattn_time else 0)

        if self.use_xattn_time:
            te = FourierFeatures(self.channels, name="xattn_time")(
                t[:, None])
            te = jax.nn.gelu(nn.Dense(self.context_embedding_features,
                                      name="to_time_embedding",
                                      dtype=self.dtype)(te))
            embedding = jnp.concatenate([embedding, te[:, None]], axis=1)
            if embedding_mask is not None:
                embedding_mask = jnp.concatenate(
                    [embedding_mask,
                     jnp.ones((b, 1), embedding_mask.dtype)], axis=1)

        fixed = FixedEmbedding(max_len, self.context_embedding_features,
                               name="fixed_embedding")(
            embedding.shape[1], b)

        if embedding_mask_proba > 0.0:
            assert cfg_key is not None, (
                "embedding_mask_proba needs cfg_key for randomness")
            drop = jax.random.bernoulli(cfg_key, embedding_mask_proba,
                                        (b, 1, 1))
            embedding = jnp.where(drop, fixed, embedding)

        unet = self._unet()
        if embedding_scale == 1.0:
            return unet(x, t, embedding=embedding,
                        embedding_mask=embedding_mask, features=features,
                        channels_list=channels_list)

        # null (or negative) branch context
        if negative_embedding is not None:
            if negative_embedding_mask is not None:
                neg_mask = negative_embedding_mask.astype(bool)[..., None]
                negative_embedding = jnp.where(neg_mask,
                                               negative_embedding, fixed)
            null_ctx = negative_embedding
        else:
            null_ctx = fixed
        # ONE batched call over [cond; null] (the reference's
        # batch_cfg=True path, adp.py:1327-1364)
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        e2 = jnp.concatenate([embedding, null_ctx], axis=0)
        m2 = (None if embedding_mask is None else
              jnp.concatenate([embedding_mask, embedding_mask], axis=0))
        f2 = (None if features is None else
              jnp.concatenate([features, features], axis=0))
        c2 = (None if channels_list is None else
              [jnp.concatenate([c, c], axis=0) for c in channels_list])
        out2 = unet(x2, t2, embedding=e2, embedding_mask=m2, features=f2,
                    channels_list=c2)
        out, out_null = jnp.split(out2, 2, axis=0)
        out_cfg = out_null + (out - out_null) * embedding_scale
        if rescale_cfg:
            out_std = jnp.std(out, axis=1, keepdims=True)
            cfg_std = jnp.std(out_cfg, axis=1, keepdims=True)
            return (scale_phi * out_cfg * (out_std / (cfg_std + 1e-8))
                    + (1.0 - scale_phi) * out_cfg)
        return out_cfg


class UNetNCCA1d(nn.Module):
    """Noise-channel conditioning augmentation: context channel maps are
    blended toward noise with per-item scales, and the scales are embedded
    as context features (reference: adp.py:1384-1437)."""

    context_features: int = 256
    # pass-through knobs
    in_channels: int = 2
    channels: int = 64
    multipliers: Sequence[int] = (1, 2, 4, 4)
    factors: Sequence[int] = (2, 2, 2)
    num_blocks: Sequence[int] = (2, 2, 2)
    attentions: Sequence[int] = (0, 0, 1, 1)
    context_channels: Sequence[int] = ()
    resnet_groups: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, t: Array, *,
                 channels_list: Sequence[Array],
                 channels_scale: Any = 0.0,
                 noise_key: Optional[Array] = None) -> Array:
        b, n = x.shape[0], len(channels_list)
        scale = jnp.broadcast_to(jnp.asarray(channels_scale, jnp.float32),
                                 (b, n))
        aug = []
        for i, item in enumerate(channels_list):
            s = scale[:, i].reshape(-1, 1, 1)
            if noise_key is not None:
                noise_key, sub = jax.random.split(noise_key)
                noise = jax.random.normal(sub, item.shape, item.dtype)
            else:
                noise = jnp.zeros_like(item)
            aug.append(noise * s + item * (1.0 - s))
        scale_emb = NumberEmbedder(self.context_features,
                                   name="embedder")(scale)
        features = jnp.sum(scale_emb, axis=1)
        return UNet1d(
            in_channels=self.in_channels, channels=self.channels,
            multipliers=self.multipliers, factors=self.factors,
            num_blocks=self.num_blocks, attentions=self.attentions,
            context_features=self.context_features,
            context_channels=self.context_channels,
            resnet_groups=self.resnet_groups,
            name="unet", dtype=self.dtype)(
            x, t, features=features, channels_list=aug)


def XUNet1d(type: str = "base", **kwargs):
    """Type dispatch matching the reference factory
    (reference: adp.py:1443-1453)."""
    if type == "base":
        return UNet1d(**kwargs)
    if type == "cfg":
        return UNetCFG1d(**kwargs)
    if type == "ncca":
        return UNetNCCA1d(**kwargs)
    raise ValueError(f"Unknown XUNet1d type: {type}")


class UNetCondAdapter(nn.Module):
    """Adapter mapping the diffusion trainer's conditioning kwarg names
    (CondRouting output: cross_attn_cond / cross_attn_cond_mask /
    input_concat_cond / global_cond / ...) onto the UNet family's inputs,
    the role of the reference's UNetCFG1DWrapper / UNet1DCondWrapper
    (reference: src/stable_audio_tools/models/diffusion.py:220-340).
    Wraps either a UNetCFG1d (CFG knobs honoured) or a plain UNet1d."""

    net: nn.Module

    @nn.compact
    def __call__(self, x: Array, t: Array,
                 cross_attn_cond: Optional[Array] = None,
                 cross_attn_cond_mask: Optional[Array] = None,
                 input_concat_cond: Optional[Array] = None,
                 global_embed: Optional[Array] = None,
                 prepend_cond: Optional[Array] = None,
                 prepend_cond_mask: Optional[Array] = None,
                 cfg_scale: float = 1.0, cfg_dropout_prob: float = 0.0,
                 rngs_key: Optional[Array] = None,
                 rescale_cfg: bool = False) -> Array:
        # kwarg names follow the DiffusionTrainer/DiT vocabulary
        # (CondRouting.gather emits global_embed; the trainer passes
        # rngs_key for CFG dropout) so both backbones are drop-in
        channels_list = ([input_concat_cond]
                         if input_concat_cond is not None else None)
        if isinstance(self.net, UNetCFG1d):
            assert cross_attn_cond is not None, (
                "adp_cfg_1d needs cross-attention conditioning")
            return self.net(
                x, t, embedding=cross_attn_cond,
                embedding_mask=cross_attn_cond_mask,
                features=global_embed, channels_list=channels_list,
                embedding_scale=cfg_scale,
                embedding_mask_proba=cfg_dropout_prob, cfg_key=rngs_key,
                rescale_cfg=rescale_cfg)
        return self.net(x, t, features=global_embed,
                        channels_list=channels_list)


def create_unet_from_config(diffusion_model_type: str, cfg) -> nn.Module:
    """Build the adp UNet family from a reference JSON diffusion config
    (reference: models/diffusion.py:645-648 dispatch + adp.py knobs).
    Returns a UNetCondAdapter ready for the diffusion trainer."""
    c = dict(cfg)

    def tup(*keys):
        for k in keys:
            if k in c and isinstance(c[k], list):
                c[k] = tuple(c[k])

    tup("multipliers", "factors", "num_blocks", "attentions",
        "context_channels")
    common = dict(
        in_channels=c.get("in_channels", 2),
        out_channels=c.get("out_channels"),
        channels=c.get("channels", 64),
        multipliers=c.get("multipliers", (1, 2, 4, 4)),
        factors=c.get("factors", (2, 2, 2)),
        num_blocks=c.get("num_blocks", (2, 2, 2)),
        attentions=c.get("attentions", (0, 0, 1, 1)),
        patch_size=c.get("patch_size", 1),
        resnet_groups=c.get("resnet_groups", 8),
        context_features=c.get("context_features"),
        context_channels=c.get("context_channels", ()),
        attention_heads=c.get("attention_heads", 8),
        attention_features=c.get("attention_features", 64),
    )
    if diffusion_model_type == "adp_cfg_1d":
        net = UNetCFG1d(
            context_embedding_max_length=c.get(
                "context_embedding_max_length", 64),
            context_embedding_features=c.get(
                "context_embedding_features", 768),
            use_xattn_time=c.get("use_xattn_time", False),
            **common)
    elif diffusion_model_type == "adp_1d":
        net = UNet1d(context_embedding_features=c.get(
            "context_embedding_features"), **common)
    else:
        raise ValueError(f"unknown adp type {diffusion_model_type!r}")
    return UNetCondAdapter(net=net)
