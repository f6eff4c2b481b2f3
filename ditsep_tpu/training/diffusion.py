"""Diffusion training for DiT / UNet generative models: v-objective and
rectified flow, conditional and unconditional.

TPU-native re-design of the stable-audio-tools diffusion training wrappers
(reference: src/stable_audio_tools/training/diffusion.py:215-560 Diffusion
{Uncond,Cond}TrainingWrapper, create_source_mixture :1408-1429). One jitted
train step; conditioning tensors are produced by a MultiConditioner and
routed via the cond-id lists, mirroring ConditionedDiffusionModelWrapper
(reference: src/stable_audio_tools/models/diffusion.py:98-214).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ditsep_tpu.inference.sampling import (
    get_alphas_sigmas, truncated_logistic_normal_rescaled,
)

Array = jax.Array


def sample_timesteps(key: Array, n: int, sampler: str = "uniform") -> Array:
    """uniform / logit_normal / trunc_logit_normal timestep samplers
    (reference: training/diffusion.py:364-376)."""
    if sampler == "uniform":
        return jax.random.uniform(key, (n,))
    if sampler == "logit_normal":
        return jax.nn.sigmoid(jax.random.normal(key, (n,)))
    if sampler == "trunc_logit_normal":
        return 1.0 - truncated_logistic_normal_rescaled(key, (n,))
    raise ValueError(f"Invalid timestep_sampler: {sampler}")


def diffusion_targets(objective: str, x0: Array, noise: Array,
                      t: Array) -> Tuple[Array, Array]:
    """(noised_input, target) for the chosen objective
    (reference: training/diffusion.py:383-399)."""
    if objective == "v":
        alphas, sigmas = get_alphas_sigmas(t)
    elif objective == "rectified_flow":
        alphas, sigmas = 1.0 - t, t
    else:
        raise ValueError(objective)
    nd = x0.ndim
    alphas = alphas.reshape((-1,) + (1,) * (nd - 1))
    sigmas = sigmas.reshape((-1,) + (1,) * (nd - 1))
    noised = x0 * alphas + noise * sigmas
    if objective == "v":
        target = noise * alphas - x0 * sigmas
    else:
        target = noise - x0
    return noised, target


def create_source_mixture(key: Array, reals: Array,
                          num_sources: int = 2) -> Tuple[Array, Array]:
    """Fake mixtures by summing randomly-offset batch elements
    (reference: training/diffusion.py:1408-1429). Returns
    (source_mixture, shifted_reals). Static-shape version: offsets are
    applied with roll+mask instead of ragged slicing."""
    b, c, t = reals.shape
    k_perm, k_off = jax.random.split(key)
    offsets = jax.random.randint(k_off, (b, num_sources), 0, t)
    # choose num_sources donors per row: a random cyclic shift of the batch
    shifts = jax.random.randint(k_perm, (num_sources,), 0, b)

    def shifted(x, offset):
        rolled = jnp.roll(x, offset, axis=-1)
        mask = jnp.arange(t) >= offset
        return rolled * mask

    source = jnp.zeros_like(reals)
    new_reals = reals
    for s in range(num_sources):
        donor = jnp.roll(jnp.arange(b), shifts[s]) if s > 0 \
            else jnp.arange(b)
        contrib = jax.vmap(shifted)(reals[donor], offsets[:, s])
        source = source + contrib
        if s == 0:  # align the "true" source with its shift
            new_reals = contrib
    return source, new_reals


def random_inpaint_mask(key: Array, x: Array, max_mask_segments: int = 10,
                        padding_mask: Optional[Array] = None
                        ) -> Tuple[Array, Array]:
    """Static-shape version of the reference's inpainting mask draw
    (reference: training/diffusion.py:848-895 random_mask): per sample,
    one of {multi-segment, full, causal} masks, never placed over
    padding. Returns (masked_input, mask) with mask (B, 1, T),
    1 = keep / 0 = regenerate for segment masks and the reference's
    conventions for the other two types. Segments are drawn as
    ``max_mask_segments`` candidate (start, length) pairs with the first
    ``num_segments`` active, so the whole draw is shape-static under
    jit."""
    b, _, t = x.shape
    pos = jnp.arange(t)
    if padding_mask is None:
        real_len = jnp.full((b,), t, jnp.int32)
    else:
        real_len = jnp.maximum(
            jnp.sum(padding_mask.astype(jnp.int32), axis=-1), 1)
    k_type, k_nseg, k_len, k_start, k_causal = jax.random.split(key, 5)
    mask_type = jax.random.randint(k_type, (b,), 0, 3)
    s = max_mask_segments
    nseg = jax.random.randint(k_nseg, (b,), 1, s + 1)
    max_seg = jnp.maximum(real_len[:, None] // nseg[:, None], 1)
    big = jnp.iinfo(jnp.int32).max
    seg_len = jax.random.randint(k_len, (b, s), 0, big) % max_seg + 1
    start = jax.random.randint(k_start, (b, s), 0, big) \
        % jnp.maximum(real_len[:, None] - seg_len + 1, 1)
    active = jnp.arange(s)[None, :] < nseg[:, None]
    in_seg = ((pos[None, None, :] >= start[..., None])
              & (pos[None, None, :] < (start + seg_len)[..., None])
              & active[..., None])
    seg_mask = 1.0 - jnp.any(in_seg, axis=1).astype(x.dtype)  # (B, T)
    full_mask = jnp.zeros((b, t), x.dtype)
    causal_len = jax.random.randint(k_causal, (b,), 0, big) % real_len + 1
    causal_mask = (pos[None, :] < causal_len[:, None]).astype(x.dtype)
    mt = mask_type[:, None]
    mask = jnp.where(mt == 0, seg_mask,
                     jnp.where(mt == 1, full_mask, causal_mask))
    mask = mask[:, None, :]
    return x * mask, mask


class DiffusionTrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    ema_params: Any


@dataclasses.dataclass(frozen=True)
class CondRouting:
    """Which conditioner outputs feed which model input
    (reference: models/diffusion.py:112-214)."""

    cross_attn_cond_ids: Tuple[str, ...] = ()
    global_cond_ids: Tuple[str, ...] = ()
    input_concat_ids: Tuple[str, ...] = ()
    prepend_cond_ids: Tuple[str, ...] = ()

    def gather(self, cond: Dict[str, Tuple[Array, Array]]) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        if self.cross_attn_cond_ids:
            embs = [cond[k][0] for k in self.cross_attn_cond_ids]
            masks = [cond[k][1] for k in self.cross_attn_cond_ids]
            out["cross_attn_cond"] = jnp.concatenate(embs, axis=1)
            out["cross_attn_cond_mask"] = jnp.concatenate(masks, axis=1)
        if self.global_cond_ids:
            g = jnp.concatenate(
                [cond[k][0].reshape(cond[k][0].shape[0], -1)
                 for k in self.global_cond_ids], axis=-1)
            out["global_embed"] = g
        if self.input_concat_ids:
            out["input_concat_cond"] = jnp.concatenate(
                [cond[k][0] for k in self.input_concat_ids], axis=1)
        if self.prepend_cond_ids:
            out["prepend_cond"] = jnp.concatenate(
                [cond[k][0] for k in self.prepend_cond_ids], axis=1)
            out["prepend_cond_mask"] = jnp.concatenate(
                [cond[k][1] for k in self.prepend_cond_ids], axis=1)
        return out


def apply_gradient_update(tx, state, loss: Array, grads,
                          ema_decay: float):
    """Shared tail of every diffusion/LM train step: optimizer update,
    EMA tracking, step bump, standard metrics. One implementation so a
    change (clipping, EMA init, extra metrics) cannot silently miss a
    trainer."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    ema = jax.tree.map(lambda e, p: ema_decay * e + (1 - ema_decay) * p,
                       state.ema_params, params)
    return (state.replace(step=state.step + 1, params=params,
                          opt_state=opt_state, ema_params=ema),
            {"train/loss": loss,
             "train/grad_norm": optax.global_norm(grads)})


@dataclasses.dataclass(frozen=True)
class DiffusionTrainer:
    """v / rectified-flow diffusion trainer for a DiT-style model.

    `model.apply(params, x, t, **cond_inputs)` predicts the objective
    target. Unconditional when `routing` is None / empty
    (reference: DiffusionUncondTrainingWrapper :215-330 and
    DiffusionCondTrainingWrapper :330-560).
    """

    model: Any
    objective: str = "v"
    timestep_sampler: str = "uniform"
    lr: float = 1e-4
    ema_decay: float = 0.9999
    cfg_dropout_prob: float = 0.1
    routing: Optional[CondRouting] = None
    # inpainting variant (reference: DiffusionCondInpaintTrainingWrapper
    # :757-1010): train with a random keep-mask; the masked input and the
    # mask feed the net through the inpaint_* conditioning ids
    inpaint: bool = False
    max_mask_segments: int = 10
    # mono->stereo prior variant (reference:
    # DiffusionPriorTrainingWrapper :1431-1580): condition on the
    # channel-mean of the target, repeated to the target's channel
    # count, injected under the 'source' conditioning id
    mono_stereo_prior: bool = False

    def make_optimizer(self):
        return optax.adamw(self.lr, b1=0.9, b2=0.999, weight_decay=1e-3)

    def init_state(self, params) -> DiffusionTrainState:
        return DiffusionTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.make_optimizer().init(params),
            ema_params=params)

    def loss(self, params, key: Array, x0: Array,
             cond: Optional[Dict[str, Tuple[Array, Array]]] = None,
             padding_mask: Optional[Array] = None) -> Array:
        k_t, k_z, k_cfg, k_inp = jax.random.split(key, 4)
        t = sample_timesteps(k_t, x0.shape[0], self.timestep_sampler)
        noise = jax.random.normal(k_z, x0.shape, x0.dtype)
        noised, target = diffusion_targets(self.objective, x0, noise, t)
        if self.inpaint:
            masked_input, mask = random_inpaint_mask(
                k_inp, x0, self.max_mask_segments, padding_mask)
            cond = dict(cond or {})
            cond["inpaint_mask"] = (mask, None)
            cond["inpaint_masked_input"] = (masked_input, None)
        if self.mono_stereo_prior:
            source = jnp.broadcast_to(x0.mean(axis=1, keepdims=True),
                                      x0.shape)
            cond = dict(cond or {})
            cond["source"] = (source, None)
        kwargs: Dict[str, Any] = {}
        if cond is not None and self.routing is not None:
            kwargs = self.routing.gather(cond)
            if self.cfg_dropout_prob > 0:
                kwargs["cfg_dropout_prob"] = self.cfg_dropout_prob
                kwargs["rngs_key"] = k_cfg
        out = self.model.apply(params, noised, t, **kwargs)
        se = (out - target) ** 2
        if padding_mask is not None:
            m = padding_mask[:, None, :]
            return jnp.sum(se * m) / jnp.clip(jnp.sum(
                jnp.broadcast_to(m, se.shape)), min=1.0)
        return jnp.mean(se)

    def train_step(self, state: DiffusionTrainState, key: Array, x0: Array,
                   cond=None, padding_mask=None):
        loss, grads = jax.value_and_grad(
            lambda p: self.loss(p, key, x0, cond, padding_mask)
        )(state.params)
        return apply_gradient_update(self.make_optimizer(), state, loss,
                                     grads, self.ema_decay)


@dataclasses.dataclass(frozen=True)
class DiffAETrainer:
    """Joint encoder + diffusion-decoder training for the
    diffusion_autoencoder model type (reference:
    training/diffusion.py DiffusionAutoencoderTrainingWrapper,
    factory.py:119-136): v-objective reconstruction where the diffusion
    net is conditioned on the (nearest-upsampled) encoder latents via
    input concat. ``params`` is {"encoder": .., "diffusion": ..}; both
    receive gradients, as in the reference."""

    model: Any  # models.diffusion_ae.DiffusionAutoencoder
    lr: float = 1e-4
    ema_decay: float = 0.9999
    timestep_sampler: str = "uniform"

    def make_optimizer(self):
        return optax.adamw(self.lr, b1=0.9, b2=0.999, weight_decay=1e-3)

    def init_state(self, params) -> DiffusionTrainState:
        return DiffusionTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.make_optimizer().init(params),
            ema_params=params)

    def loss(self, params, key: Array, x0: Array) -> Array:
        k_t, k_z = jax.random.split(key)
        t = sample_timesteps(k_t, x0.shape[0], self.timestep_sampler)
        latents = self.model.encoder.apply(params["encoder"], x0)
        noise = jax.random.normal(k_z, x0.shape, x0.dtype)
        noised, target = diffusion_targets("v", x0, noise, t)
        out = self.model.diffusion_input(params["diffusion"], noised, t,
                                         latents)
        return jnp.mean((out - target) ** 2)

    def train_step(self, state: DiffusionTrainState, key: Array,
                   x0: Array):
        loss, grads = jax.value_and_grad(self.loss)(state.params, key, x0)
        return apply_gradient_update(self.make_optimizer(), state, loss,
                                     grads, self.ema_decay)
