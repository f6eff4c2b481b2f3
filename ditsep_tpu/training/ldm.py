"""LDM decoder finetune: train the VAE decoder on separation outputs.

TPU-native re-design of the reference ``LDM`` Lightning module
(reference: src/ldm.py:42-731). The reference uses Lightning manual
optimization with a GAN alternation on odd/even global steps; here the
generator and discriminator updates are two separately-jitted pure steps and
the host loop alternates them by step parity -- same schedule, static
graphs.

Parameter partitioning mirrors the reference's requires_grad switches
(reference: src/ldm.py:252-270): only the VAE decoder (plus the
discriminator) trains; encoder/bottleneck/score-model params are held
frozen and passed separately.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

import flax.struct

from ditsep_tpu.models.discriminators import (
    MultiScaleSTFTDiscriminator, encodec_discriminator_loss,
)
from ditsep_tpu.models.oobleck import OobleckVAE
from ditsep_tpu.training import auraloss
from ditsep_tpu.training.diffsep_latent import LatentDiffSepTrainer
from ditsep_tpu.training.schedules import inverse_lr_schedule

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LDMLossWeights:
    """(reference: src/config/ldm/training/default.yaml and
    src/ldm.py:100-161)."""

    mrstft: float = 1.0
    l1: float = 0.0
    l2: float = 0.0
    adversarial: float = 0.1
    feature_matching: float = 5.0
    # MRSTFT config (oobleck_finetune.json 'spectral')
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512, 256, 128, 64, 32)
    hop_sizes: Tuple[int, ...] = (512, 256, 128, 64, 32, 16, 8)
    perceptual_weighting: bool = True
    sample_rate: int = 8000


class LDMState(flax.struct.PyTreeNode):
    step: Array
    decoder_params: Any
    gen_opt_state: Any
    disc_params: Any
    disc_opt_state: Any
    ema_decoder_params: Any


@dataclasses.dataclass(frozen=True)
class LDMTrainer:
    """Decoder finetune trainer.

    `latent_trainer` supplies the frozen separation pipeline (score model +
    SDE + VAE encode/sampling); `disc` the Encodec discriminator (None to
    train without GAN, as the shipped ldm config does -- reference:
    config/ldm/training/default.yaml discriminator commented out).
    """

    latent_trainer: LatentDiffSepTrainer
    disc: Optional[MultiScaleSTFTDiscriminator] = None
    weights: LDMLossWeights = LDMLossWeights()
    lr: float = 1.5e-4
    clip_grad_norm: float = 1.0
    ema_decay: float = 0.9999
    warmup_steps: int = 0
    warmup_mode: str = "full"  # 'full' | 'adv'

    @property
    def vae(self) -> OobleckVAE:
        return self.latent_trainer.vae

    # -- parameter plumbing -------------------------------------------------
    def split_vae_params(self, vae_params):
        """Split the VAE tree into (frozen_rest, decoder_subtree)."""
        params = dict(vae_params["params"])
        decoder = params.pop("decoder")
        return params, decoder

    def merge_vae_params(self, frozen_rest, decoder_params):
        return {"params": {**frozen_rest, "decoder": decoder_params}}

    def make_gen_optimizer(self):
        return optax.chain(
            optax.clip_by_global_norm(self.clip_grad_norm),
            optax.adamw(inverse_lr_schedule(self.lr), b1=0.8, b2=0.99,
                        weight_decay=1e-3),
        )

    def make_disc_optimizer(self):
        return optax.chain(
            optax.clip_by_global_norm(self.clip_grad_norm),
            optax.adamw(inverse_lr_schedule(2.0 * self.lr), b1=0.8, b2=0.99,
                        weight_decay=1e-3),
        )

    def init_state(self, vae_params, disc_params=None) -> LDMState:
        _, dec = self.split_vae_params(vae_params)
        gen_tx = self.make_gen_optimizer()
        state = LDMState(
            step=jnp.zeros((), jnp.int32),
            decoder_params=dec,
            gen_opt_state=gen_tx.init(dec),
            disc_params=disc_params,
            disc_opt_state=(self.make_disc_optimizer().init(disc_params)
                            if disc_params is not None else None),
            ema_decoder_params=dec,
        )
        return state

    # -- losses -------------------------------------------------------------
    def decode_with(self, frozen_rest, decoder_params, latents: Array,
                    target_dim: Optional[int] = None) -> Array:
        """(B, n_src, D, Tl) latents -> (B, n_src, T) waveforms, gradients
        flowing through the decoder (reference: src/ldm.py:208-215
        decode_grad)."""
        vp = self.merge_vae_params(frozen_rest, decoder_params)
        return self.latent_trainer.decode(vp, latents,
                                          target_dim=target_dim)

    def gen_loss(self, decoder_params, disc_params, frozen_rest,
                 latents: Array, reals: Array, warmed_up: bool):
        """Generator losses: PIT-MRSTFT + PIT L1/L2 + adversarial +
        feature matching (reference: src/ldm.py:100-161, 476-484)."""
        w = self.weights
        decoded = self.decode_with(frozen_rest, decoder_params, latents,
                                   target_dim=reals.shape[-1])
        losses: Dict[str, Array] = {}
        mrstft = auraloss.pit_min(
            lambda e, r: auraloss.multi_resolution_stft_loss(
                e, r, fft_sizes=w.fft_sizes, hop_sizes=w.hop_sizes,
                sample_rate=w.sample_rate,
                perceptual_weighting=w.perceptual_weighting),
            decoded, reals)
        losses["pit_mrstft_loss"] = w.mrstft * mrstft
        if w.l1 > 0:
            losses["pit_l1_loss"] = w.l1 * auraloss.pit_min(
                auraloss.l1_loss, decoded, reals)
        if w.l2 > 0:
            losses["pit_l2_loss"] = w.l2 * auraloss.pit_min(
                auraloss.mse_loss, decoded, reals)
        if self.disc is not None and disc_params is not None and warmed_up:
            _, adv_loss, fm = encodec_discriminator_loss(
                self.disc, disc_params, reals, decoded)
            losses["loss_adv"] = w.adversarial * adv_loss
            losses["feature_matching_loss"] = w.feature_matching * fm
        total = sum(losses.values())
        return total, {**losses, "decoded_std": jnp.std(decoded)}

    # -- train steps --------------------------------------------------------
    def gen_step(self, state: LDMState, frozen_rest, latents: Array,
                 reals: Array, warmed_up: bool = True):
        """One generator (decoder) update. Jit with static warmed_up."""
        def loss_fn(dec_params):
            return self.gen_loss(dec_params, state.disc_params, frozen_rest,
                                 latents, reals, warmed_up)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.decoder_params)
        tx = self.make_gen_optimizer()
        updates, opt_state = tx.update(grads, state.gen_opt_state,
                                       state.decoder_params)
        dec = optax.apply_updates(state.decoder_params, updates)
        d = self.ema_decay
        ema = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                           state.ema_decoder_params, dec)
        new_state = state.replace(
            step=state.step + 1, decoder_params=dec, gen_opt_state=opt_state,
            ema_decoder_params=ema)
        return new_state, {"train/loss": loss, **{
            f"train/{k}": v for k, v in aux.items()}}

    def disc_step(self, state: LDMState, frozen_rest, latents: Array,
                  reals: Array):
        """One discriminator update (odd steps once warmed;
        reference: src/ldm.py:449-471)."""
        decoded = jax.lax.stop_gradient(self.decode_with(
            frozen_rest, state.decoder_params, latents,
            target_dim=reals.shape[-1]))

        def loss_fn(dp):
            dis_loss, _, _ = encodec_discriminator_loss(
                self.disc, dp, reals, decoded)
            return dis_loss

        loss, grads = jax.value_and_grad(loss_fn)(state.disc_params)
        tx = self.make_disc_optimizer()
        updates, opt_state = tx.update(grads, state.disc_opt_state,
                                       state.disc_params)
        dp = optax.apply_updates(state.disc_params, updates)
        new_state = state.replace(step=state.step + 1, disc_params=dp,
                                  disc_opt_state=opt_state)
        return new_state, {"train/discriminator_loss": loss}

    def use_disc_this_step(self, step: int) -> bool:
        """GAN alternation schedule (reference: src/ldm.py:449-456)."""
        if self.disc is None:
            return False
        warmed = step >= self.warmup_steps
        return bool(step % 2) and (
            (self.warmup_mode == "full" and warmed)
            or self.warmup_mode == "adv")
