"""Audio language-model trainer.

TPU-native counterpart of AudioLanguageModelTrainingWrapper
(reference: src/stable_audio_tools/training/lm.py:20-77,115-180): AdamW
(0.9, 0.95) with weight decay 0.1 over the per-codebook masked
cross-entropy of `ditsep_tpu.models.lm.lm_loss`, EMA params carried in
the train state (the reference uses ema_pytorch beta=0.99 every 10
steps; here the equivalent per-step decay keeps the update inside one
jitted step). The codec/pretransform that produced the tokens is frozen
outside this trainer, as in the reference (`lm.py:34`).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ditsep_tpu.models.lm import AudioLM, lm_loss
from ditsep_tpu.training.diffusion import (DiffusionTrainState,
                                           apply_gradient_update)

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LMTrainer:
    """Next-token training over multi-codebook token grids (B, Q, T)."""

    model: AudioLM
    pattern: Any = None  # defaults to the model's DelayPattern in lm_loss
    lr: float = 1e-4
    b1: float = 0.9
    b2: float = 0.95
    weight_decay: float = 0.1
    # reference: EMA(beta=0.99, update_every=10) -> per-step 0.99**(1/10)
    ema_decay: float = 0.998995
    clip_grad_norm: float = 0.0

    def make_optimizer(self):
        tx = optax.adamw(self.lr, b1=self.b1, b2=self.b2,
                         weight_decay=self.weight_decay)
        if self.clip_grad_norm > 0:
            tx = optax.chain(
                optax.clip_by_global_norm(self.clip_grad_norm), tx)
        return tx

    def init_state(self, params) -> DiffusionTrainState:
        return DiffusionTrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            opt_state=self.make_optimizer().init(params),
            ema_params=params)

    def loss(self, params, tokens: Array) -> Array:
        return lm_loss(self.model, params, tokens, self.pattern)

    def train_step(self, state: DiffusionTrainState, tokens: Array):
        loss, grads = jax.value_and_grad(self.loss)(state.params, tokens)
        return apply_gradient_update(self.make_optimizer(), state, loss,
                                     grads, self.ema_decay)
