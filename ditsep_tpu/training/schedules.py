"""LR schedules used by the stable-audio training wrappers."""
from __future__ import annotations

import optax


def inverse_lr_schedule(base_lr: float, inv_gamma: float = 200000.0,
                        power: float = 0.5,
                        warmup: float = 0.999) -> optax.Schedule:
    """k-diffusion InverseLR: exponential warmup then inverse-power decay
    (reference: oobleck_finetune.json scheduler config; semantics from the
    InverseLR scheduler stable-audio-tools instantiates).

    lr(step) = base_lr * (1 - warmup^(step+1)) * (1 + step/inv_gamma)^-power
    """
    def schedule(step):
        w = 1.0 - warmup ** (step + 1.0) if warmup > 0 else 1.0
        return base_lr * w * (1.0 + step / inv_gamma) ** -power

    return schedule
