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


def create_schedule_from_config(scheduler_cfg, base_lr: float):
    """Map the reference's scheduler schema onto an optax schedule
    (reference: training/utils.py:100-115 create_scheduler_from_config;
    InverseLR from k-diffusion, the rest resolved from
    torch.optim.lr_scheduler by name). Schedules are per-step, like the
    reference's interval="step" usage."""
    kind = scheduler_cfg["type"]
    c = dict(scheduler_cfg.get("config", {}))
    if kind == "InverseLR":
        return inverse_lr_schedule(
            base_lr, inv_gamma=c.get("inv_gamma", 200000.0),
            power=c.get("power", 0.5), warmup=c.get("warmup", 0.999))
    if kind == "ExponentialLR":
        return optax.exponential_decay(
            base_lr, transition_steps=1, decay_rate=c["gamma"])
    if kind == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            base_lr, decay_steps=c["T_max"],
            alpha=c.get("eta_min", 0.0) / max(base_lr, 1e-12))
    if kind == "LinearLR":
        return optax.linear_schedule(
            base_lr * c.get("start_factor", 1.0 / 3.0),
            base_lr * c.get("end_factor", 1.0),
            c.get("total_iters", 5))
    raise NotImplementedError(f"Unknown scheduler type: {kind}")


def create_optimizer_from_config(opt_cfg, scheduler_cfg=None):
    """Map the reference's optimizer schema onto an optax transform
    (reference: training/utils.py:79-98 create_optimizer_from_config;
    types resolve against torch.optim by name there — the ones the
    shipped configs and wrappers use are covered here). ``amsgrad`` has
    no optax counterpart and is ignored with the same AdamW update
    otherwise."""
    kind = opt_cfg["type"]
    c = dict(opt_cfg.get("config", {}))
    lr = c.pop("lr", 1e-4)
    if scheduler_cfg is not None:
        lr = create_schedule_from_config(scheduler_cfg, lr)
    b1, b2 = c.pop("betas", (0.9, 0.999))
    wd = c.pop("weight_decay", 0.0)
    c.pop("amsgrad", None)
    c.pop("eps", None)
    if kind in ("AdamW", "FusedAdam"):
        return optax.adamw(lr, b1=b1, b2=b2, weight_decay=wd)
    if kind == "Adam":
        tx = optax.adam(lr, b1=b1, b2=b2)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
        return tx
    if kind == "SGD":
        return optax.sgd(lr, momentum=c.pop("momentum", None),
                         nesterov=c.pop("nesterov", False))
    if kind == "RMSprop":
        return optax.rmsprop(lr, decay=c.pop("alpha", 0.99),
                             momentum=c.pop("momentum", 0.0))
    raise NotImplementedError(f"Unknown optimizer type: {kind}")
