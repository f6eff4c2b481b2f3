"""Generic trainer for stable-audio JSON model configs.

The reference trains these configs through stable-audio-tools' upstream
train.py (not vendored in the repo): create model + training wrapper +
demo callback from one JSON config and fit (reference:
src/stable_audio_tools/training/factory.py:5-245,
src/training/validate_stable.py:20-133 uses the same wrapper path).
This CLI composes our factories the same way:
create_model_from_config -> create_trainer_from_config ->
create_demo_callback_from_config, one jitted train step, MetricsLogger
scalars, top-k checkpoints.

Supported model types here: autoencoder (VAE-GAN alternation),
diffusion_uncond (audio-domain, e.g. the dance_diffusion configs), lm
(token grids). Conditional diffusion configs need text conditioners
whose pretrained weights are download-gated in this image — train those
with the dedicated entries (train_diffsep / train_diffsep_latent /
train_ldm) or inject host encoders via ditsep_tpu.models.conditioners.
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.utils.checkpoint import CheckpointManager
from ditsep_tpu.utils.logging import MetricsLogger


def _synthetic_audio(key, batch: int, channels: int, length: int):
    """Tonal mixtures: deterministic, finite, non-degenerate."""
    k1, k2 = jax.random.split(key)
    t = jnp.arange(length) / 8000.0
    freqs = jax.random.uniform(k1, (batch, channels, 1), minval=80.0,
                               maxval=2000.0)
    phase = jax.random.uniform(k2, (batch, channels, 1), maxval=2 * np.pi)
    return 0.3 * jnp.sin(2 * np.pi * freqs * t[None, None, :] + phase)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model-config", required=True,
                   help="path to a stable-audio model JSON config")
    p.add_argument("--workdir", default="./runs/stable")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--max-steps", type=int, default=100)
    p.add_argument("--sample-size", type=int, default=None,
                   help="override the config's sample_size")
    p.add_argument("--ckpt-every", type=int, default=0,
                   help="save a checkpoint every N steps (0 = end only)")
    p.add_argument("--demo-every", type=int, default=0,
                   help="override training.demo.demo_every (0 = config)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the workdir's latest checkpoint "
                        "(written by --ckpt-every)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ditsep_tpu.models.factory import create_model_from_config
    from ditsep_tpu.training.demo import create_demo_callback_from_config
    from ditsep_tpu.training.factory import create_trainer_from_config

    with open(args.model_config) as f:
        cfg = json.load(f)
    cfg.setdefault("training", {"learning_rate": 1e-4})
    if args.sample_size is not None:
        cfg["sample_size"] = args.sample_size
    if args.demo_every:
        cfg["training"].setdefault("demo", {})["demo_every"] = \
            args.demo_every
    model_type = cfg.get("model_type")
    sample_size = cfg.get("sample_size", 65536)

    model = create_model_from_config(cfg)
    trainer = create_trainer_from_config(cfg, model)
    try:
        demo_cb = create_demo_callback_from_config(
            cfg, pattern=model[1] if isinstance(model, tuple) else None)
    except NotImplementedError:
        demo_cb = None

    logger = MetricsLogger(args.workdir)
    ckpts = CheckpointManager(args.workdir, monitor="train/loss",
                              mode="min", save_top_k=3)
    key = jax.random.PRNGKey(args.seed)
    k_init, k_data, k_step = jax.random.split(key, 3)

    if model_type == "autoencoder":
        in_ch = cfg["model"].get("encoder", {}).get("config", {}).get(
            "in_channels", 1)
        batch = _synthetic_audio(k_data, args.batch_size, in_ch,
                                 sample_size)
        vae_params = model.init(k_init, batch)
        disc_params = (trainer.disc.init(k_init, batch)
                       if trainer.disc is not None else None)
        state, start = _maybe_resume(
            args, ckpts, trainer.init_state(vae_params, disc_params))
        # warmed_up is a per-step host boolean (step >= warmup_steps);
        # static under jit -> at most two compiled gen variants. Before
        # warmup the encoder trains and adversarial losses are off;
        # after, encoder_freeze_on_warmup/adversarial apply (reference:
        # autoencoders.py:420-470)
        gen = jax.jit(trainer.gen_step, static_argnames=("warmed_up",))
        dsc = jax.jit(trainer.disc_step) if trainer.disc is not None \
            else None
        m = {}
        for step in range(start, args.max_steps):
            k = jax.random.fold_in(k_step, step)
            if dsc is not None and trainer.use_disc_this_step(step):
                state, m = dsc(state, k, batch)
            else:
                state, m = gen(state, k, batch,
                               warmed_up=step >= trainer.warmup_steps)
            _log(logger, ckpts, state, step, m, args)
            if demo_cb is not None and step > 0 and demo_cb.due(step):
                demo_cb(logger, step, model, state.vae_params, batch)
        metrics = {k2: float(v) for k2, v in m.items()}
    elif model_type == "diffusion_uncond":
        net = model
        io_ch = getattr(net, "io_channels", 2)
        x0 = _synthetic_audio(k_data, args.batch_size, io_ch, sample_size)
        params = net.init(k_init, x0, jnp.full((args.batch_size,), 0.5))
        state, start = _maybe_resume(args, ckpts,
                                     trainer.init_state(params))
        step_fn = jax.jit(trainer.train_step)
        m = {}
        for step in range(start, args.max_steps):
            state, m = step_fn(state, jax.random.fold_in(k_step, step), x0)
            _log(logger, ckpts, state, step, m, args)
            if demo_cb is not None and step > 0 and demo_cb.due(step):
                demo_cb(logger, step, net, state.ema_params,
                        jax.random.fold_in(k_step, 1_000_000 + step))
        metrics = {k2: float(v) for k2, v in m.items()}
    elif model_type == "lm":
        lm, pattern = model
        t_tok = max(sample_size // 2048, 8)
        tokens = jax.random.randint(
            k_data, (args.batch_size, lm.n_quantizers, t_tok), 0,
            lm.codebook_size)
        state, start = _maybe_resume(
            args, ckpts, trainer.init_state(lm.init(k_init, tokens)))
        step_fn = jax.jit(trainer.train_step)
        m = {}
        for step in range(start, args.max_steps):
            state, m = step_fn(state, tokens)
            _log(logger, ckpts, state, step, m, args)
            if demo_cb is not None and step > 0 and demo_cb.due(step):
                demo_cb(logger, step, lm, state.ema_params,
                        jax.random.fold_in(k_step, step), length=t_tok)
        metrics = {k2: float(v) for k2, v in m.items()}
    else:
        raise SystemExit(
            f"model_type {model_type!r} is not trainable from this "
            "generic entry (conditional diffusion needs host text "
            "encoders); use the dedicated train_* CLIs")

    ckpts.save(state, args.max_steps, metrics)
    print(json.dumps({"final": metrics, "steps": args.max_steps}))
    return metrics


def _maybe_resume(args, ckpts, fresh_state):
    """Restore the rolling 'latest' checkpoint into the freshly-built
    state structure and continue from its step (orbax restore needs the
    abstract tree, which init_state provides)."""
    if not args.resume:
        return fresh_state, 0
    try:
        state = ckpts.restore(fresh_state, prefer="latest")
    except FileNotFoundError:
        return fresh_state, 0
    start = int(state.step) if hasattr(state, "step") else 0
    print(json.dumps({"resumed_at_step": start}))
    return state, start


def _log(logger, ckpts, state, step, m, args):
    if step % 10 == 0:
        logger.log({k: float(v) for k, v in m.items()}, step)
    if args.ckpt_every and step and step % args.ckpt_every == 0:
        ckpts.save_latest(state, step)


if __name__ == "__main__":
    main()
