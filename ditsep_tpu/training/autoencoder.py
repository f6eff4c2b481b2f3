"""VAE-GAN training for the Oobleck autoencoder.

TPU-native re-design of the stable-audio-tools AutoencoderTrainingWrapper
(reference: src/stable_audio_tools/training/autoencoders.py:31-671):
generator losses = perceptually-weighted MRSTFT + L1 + KL, adversarial +
feature matching once warmed; discriminator trains on odd steps. The
Lightning manual-optimization alternation becomes two jitted pure steps
selected by step parity on the host (same schedule as the reference's
``global_step % 2`` gate).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ditsep_tpu.models.discriminators import (
    discriminator_loss,
)
from ditsep_tpu.models.oobleck import OobleckVAE
from ditsep_tpu.training import auraloss
from ditsep_tpu.training.schedules import inverse_lr_schedule

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class AutoencoderLossConfig:
    """(reference: oobleck_finetune.json 'training.loss_configs')."""

    mrstft: float = 1.0
    l1: float = 0.0
    kl: float = 1e-4
    adversarial: float = 0.1
    feature_matching: float = 5.0
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512, 256, 128, 64, 32)
    hop_sizes: Tuple[int, ...] = (512, 256, 128, 64, 32, 16, 8)
    perceptual_weighting: bool = True
    sample_rate: int = 8000


class AutoencoderState(flax.struct.PyTreeNode):
    step: Array
    vae_params: Any
    vae_opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    ema_vae_params: Any


@dataclasses.dataclass(frozen=True)
class AutoencoderTrainer:
    vae: OobleckVAE
    disc: Optional[Any] = None  # any family from discriminators.py
    loss_cfg: AutoencoderLossConfig = AutoencoderLossConfig()
    lr: float = 1.5e-4
    disc_lr: float = 3e-4
    warmup_steps: int = 0
    encoder_freeze_on_warmup: bool = False
    ema_decay: float = 0.9999
    clip_grad_norm: float = 0.0
    # config-driven optimizer overrides (reference: the training block's
    # optimizer_configs consumed by training/factory.py:44-51) — built by
    # schedules.create_optimizer_from_config; defaults below otherwise
    vae_tx: Optional[Any] = None
    disc_tx: Optional[Any] = None
    # noise-resistance latent masking + teacher distillation
    # (reference: factory.py:29-43, autoencoders.py:46-47,171-179,404-415)
    latent_mask_ratio: float = 0.0
    teacher_vae: Optional[Any] = None
    teacher_params: Optional[Any] = None

    def make_vae_optimizer(self):
        tx = self.vae_tx
        if tx is None:
            tx = optax.adamw(inverse_lr_schedule(self.lr), b1=0.8, b2=0.99,
                             weight_decay=1e-3)
        if self.clip_grad_norm > 0:
            tx = optax.chain(optax.clip_by_global_norm(self.clip_grad_norm),
                             tx)
        return tx

    def make_disc_optimizer(self):
        if self.disc_tx is not None:
            return self.disc_tx
        return optax.adamw(inverse_lr_schedule(self.disc_lr), b1=0.8,
                           b2=0.99, weight_decay=1e-3)

    def init_state(self, vae_params, disc_params=None) -> AutoencoderState:
        return AutoencoderState(
            step=jnp.zeros((), jnp.int32),
            vae_params=vae_params,
            vae_opt_state=self.make_vae_optimizer().init(vae_params),
            disc_params=disc_params,
            disc_opt_state=(self.make_disc_optimizer().init(disc_params)
                            if disc_params is not None else None),
            ema_vae_params=vae_params,
        )

    def _roundtrip(self, vae_params, key: Array, reals: Array,
                   freeze_encoder: bool = False):
        """encode (posterior sample) -> [latent mask] -> decode; returns
        (decoded, reals_trimmed, kl, latents). latent_mask_ratio zeroes
        random latent entries for noise resistance before decoding
        (reference: autoencoders.py:410-415)."""
        k_enc, k_mask = jax.random.split(key)

        def enc(p):
            lat, info = self.vae.apply(p, reals, key=k_enc,
                                       return_info=True,
                                       method=self.vae.encode)
            return lat, info["kl"]

        if freeze_encoder:
            lat, kl = enc(jax.tree.map(jax.lax.stop_gradient, vae_params))
        else:
            lat, kl = enc(vae_params)
        dec_in = lat
        if self.latent_mask_ratio > 0.0:
            drop = jax.random.uniform(k_mask, lat.shape) \
                < self.latent_mask_ratio
            dec_in = jnp.where(drop, 0.0, lat)
        decoded = self.vae.apply(vae_params, dec_in,
                                 method=self.vae.decode)
        t = min(decoded.shape[-1], reals.shape[-1])
        return decoded[..., :t], reals[..., :t], kl, lat

    def gen_loss(self, vae_params, disc_params, key: Array, reals: Array,
                 warmed_up: bool):
        """(reference: autoencoders.py:162-250, 420-470)."""
        cfg = self.loss_cfg
        freeze = warmed_up and self.encoder_freeze_on_warmup
        decoded, reals_t, kl, lat = self._roundtrip(vae_params, key, reals,
                                                    freeze_encoder=freeze)
        losses: Dict[str, Array] = {}
        losses["mrstft"] = cfg.mrstft * auraloss.multi_resolution_stft_loss(
            decoded, reals_t, fft_sizes=cfg.fft_sizes,
            hop_sizes=cfg.hop_sizes, sample_rate=cfg.sample_rate,
            perceptual_weighting=cfg.perceptual_weighting)
        if cfg.l1 > 0:
            losses["l1"] = cfg.l1 * auraloss.l1_loss(decoded, reals_t)
        losses["kl"] = cfg.kl * kl
        if self.teacher_vae is not None:
            # distillation (reference: autoencoders.py:171-179, 404-409):
            # four terms tying the student's latent space and both
            # encode/decode directions to the frozen teacher
            tp = jax.tree.map(jax.lax.stop_gradient, self.teacher_params)
            # the reference teacher encode SAMPLES the posterior
            # (autoencoders.py:404-409), it does not take the mean
            t_lat = self.teacher_vae.apply(
                tp, reals, key=jax.random.fold_in(key, 7),
                method=self.teacher_vae.encode)
            t_dec = self.teacher_vae.apply(tp, t_lat,
                                           method=self.teacher_vae.decode)
            own_lat_t_dec = self.teacher_vae.apply(
                tp, lat, method=self.teacher_vae.decode)
            t_lat_own_dec = self.vae.apply(vae_params, t_lat,
                                           method=self.vae.decode)
            w = cfg.mrstft

            def mr(a, b):
                t = min(a.shape[-1], b.shape[-1])
                return auraloss.multi_resolution_stft_loss(
                    a[..., :t], b[..., :t], fft_sizes=cfg.fft_sizes,
                    hop_sizes=cfg.hop_sizes, sample_rate=cfg.sample_rate,
                    perceptual_weighting=cfg.perceptual_weighting)

            losses["latent_distill"] = w * jnp.mean((t_lat - lat) ** 2)
            losses["mrstft_distill"] = w * mr(decoded, t_dec)
            losses["mrstft_own_latents_teacher"] = \
                w * mr(own_lat_t_dec, reals_t)
            losses["mrstft_teacher_latents_own"] = \
                w * mr(t_lat_own_dec, reals_t)
        if self.disc is not None and disc_params is not None and warmed_up:
            # family-generic dispatch: encodec/oobleck hinge losses or
            # DAC/BigVGAN least-squares losses
            _, adv, fm = discriminator_loss(
                self.disc, disc_params, reals_t, decoded)
            losses["adversarial"] = cfg.adversarial * adv
            losses["feature_matching"] = cfg.feature_matching * fm
        total = sum(losses.values())
        return total, losses

    def gen_step(self, state: AutoencoderState, key: Array, reals: Array,
                 warmed_up: bool = True):
        def loss_fn(p):
            return self.gen_loss(p, state.disc_params, key, reals, warmed_up)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.vae_params)
        tx = self.make_vae_optimizer()
        updates, opt_state = tx.update(grads, state.vae_opt_state,
                                       state.vae_params)
        vp = optax.apply_updates(state.vae_params, updates)
        d = self.ema_decay
        ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                           state.ema_vae_params, vp)
        new_state = state.replace(step=state.step + 1, vae_params=vp,
                                  vae_opt_state=opt_state,
                                  ema_vae_params=ema)
        return new_state, {"train/loss": loss,
                           **{f"train/{k}": v for k, v in aux.items()}}

    def disc_step(self, state: AutoencoderState, key: Array, reals: Array):
        decoded, reals_t, _, _ = self._roundtrip(
            jax.tree.map(jax.lax.stop_gradient, state.vae_params), key,
            reals)

        def loss_fn(dp):
            dis, _, _ = discriminator_loss(self.disc, dp, reals_t, decoded)
            return dis

        loss, grads = jax.value_and_grad(loss_fn)(state.disc_params)
        tx = self.make_disc_optimizer()
        updates, opt_state = tx.update(grads, state.disc_opt_state,
                                       state.disc_params)
        dp = optax.apply_updates(state.disc_params, updates)
        new_state = state.replace(step=state.step + 1, disc_params=dp,
                                  disc_opt_state=opt_state)
        return new_state, {"train/discriminator_loss": loss}

    def use_disc_this_step(self, step: int) -> bool:
        if self.disc is None:
            return False
        return bool(step % 2) and step >= self.warmup_steps
