"""LDM decoder-finetune entry (reference: src/train_ldm.py:27-173):
optionally generate/use a latent cache, then finetune the VAE decoder on
PIT-MRSTFT (+ GAN) against the clean sources.
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.cli.common import add_common_args, load_config, make_dataset
from ditsep_tpu.cli.train_diffsep_latent import init_vae_params
from ditsep_tpu.configs import build_latent_trainer
from ditsep_tpu.data import LatentDataset
from ditsep_tpu.training.ldm import LDMLossWeights, LDMTrainer
from ditsep_tpu.utils.checkpoint import CheckpointManager
from ditsep_tpu.utils.logging import MetricsLogger


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.set_defaults(config="ldm")
    p.add_argument("--vae-params", default=None)
    p.add_argument("--latent-cache", required=True,
                   help="latent cache dir (see cli.cache_latents)")
    p.add_argument("--use-disc", action="store_true")
    p.add_argument("--resume", action="store_true",
                   help="resume from the workdir's rolling latest "
                        "checkpoint (fresh start if none exists)")
    p.add_argument("--demo-every", type=int, default=0,
                   help="log demo decodes (est/target wavs through the "
                        "live decoder) every N steps; the reference's "
                        "LDMDemoCallback analogue (src/ldm.py:630-726)")
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    latent_trainer = build_latent_trainer(cfg)
    key = jax.random.PRNGKey(args.seed)
    vae_params = init_vae_params(latent_trainer, args.vae_params, key)

    base_ds = make_dataset(cfg, "train", args.data_path, args.synthetic,
                           synthetic_items=args.synthetic_items,
                           synthetic_len_s=args.synthetic_len_s)
    ds = LatentDataset(args.latent_cache, base_ds)

    disc = None
    disc_params = None
    tcfg = cfg["training"]
    if args.use_disc:
        from ditsep_tpu.models.discriminators import (
            MultiScaleSTFTDiscriminator)
        dc = tcfg["loss"]["discriminator"]
        disc = MultiScaleSTFTDiscriminator(
            filters=dc["filters"], n_ffts=tuple(dc["n_ffts"]),
            hop_lengths=tuple(dc["hop_lengths"]))
        tgt0, _ = ds[0]
        # the LDM adversarial losses see (B, n_src, T) stacks (both the
        # separated stems and the targets), so the discriminator must be
        # built for n_src waveform channels
        disc_params = disc.init(key, jnp.asarray(tgt0[None]))

    sp = tcfg["loss"]["spectral"]
    ldm = LDMTrainer(
        latent_trainer=latent_trainer, disc=disc,
        weights=LDMLossWeights(
            mrstft=sp["weights"]["mrstft"],
            l1=tcfg["loss"]["time"]["weights"].get("l1", 0.0),
            fft_sizes=tuple(sp["fft_sizes"]),
            hop_sizes=tuple(sp["hop_sizes"]),
            perceptual_weighting=sp["perceptual_weighting"],
            sample_rate=cfg["datamodule"].get("fs", 8000)),
        lr=tcfg["lr"], clip_grad_norm=tcfg["clip_grad_norm"],
        warmup_steps=tcfg["warmup_steps"],
        warmup_mode=tcfg["warmup_mode"])

    frozen_rest, _ = ldm.split_vae_params(vae_params)
    state = ldm.init_state(vae_params, disc_params)
    logger = MetricsLogger(args.workdir)
    ckpt = CheckpointManager(f"{args.workdir}/checkpoints",
                             monitor="train/loss", mode="min",
                             save_top_k=5)
    if args.resume:
        try:
            state = ckpt.restore(state, prefer="latest")
            print(f"[train_ldm] resumed at step {int(state.step)}")
        except FileNotFoundError:
            pass

    demo_batch = None
    if args.demo_every:
        # fixed demo batch: the cached separated latents decoded through
        # the LIVE decoder, logged against the clean targets — the
        # decoder-finetune-time view of the reference's LDMDemoCallback
        # (src/ldm.py:630-726 logs mix/est/target media)
        d_tgt, d_lat = ds[0]
        demo_batch = (jnp.asarray(d_tgt[None]), jnp.asarray(d_lat[None]))

    def run_demo(step):
        from ditsep_tpu.training.demo import _log_wavs
        d_tgt, d_lat = demo_batch
        decoded = ldm.decode_with(frozen_rest, state.decoder_params,
                                  d_lat, target_dim=d_tgt.shape[-1])
        fs = cfg["datamodule"].get("fs", 8000)
        for s in range(decoded.shape[1]):
            _log_wavs(logger, f"demo/est_{s}", decoded[:, s:s + 1], step,
                      fs, 2)
            _log_wavs(logger, f"demo/target_{s}", d_tgt[:, s:s + 1], step,
                      fs, 2)

    gen_step_p = jax.jit(lambda s, fr, l, r, w: ldm.gen_step(
        s, fr, l, r, warmed_up=w), static_argnums=(4,))
    gen_step = lambda s, l, r, w: gen_step_p(s, frozen_rest, l, r, w)
    disc_step_p = jax.jit(
        lambda s, fr, l, r: ldm.disc_step(s, fr, l, r))
    disc_step = lambda s, l, r: disc_step_p(s, frozen_rest, l, r)

    batch_size = args.batch_size or 4
    step = int(state.step)  # nonzero after --resume
    max_steps = args.max_steps or 10000
    epoch = 0
    while step < max_steps:
        order = np.random.default_rng(args.seed + epoch).permutation(len(ds))
        for start in range(0, len(order) - batch_size + 1, batch_size):
            idxs = order[start:start + batch_size]
            items = [ds[int(i)] for i in idxs]
            t_min = min(t.shape[-1] for t, _ in items)
            l_min = min(l.shape[-1] for _, l in items)
            reals = jnp.asarray(np.stack(
                [t[..., :t_min] for t, _ in items]))
            latents = jnp.asarray(np.stack(
                [l[..., :l_min] for _, l in items]))
            warmed = step >= ldm.warmup_steps
            if ldm.use_disc_this_step(step):
                state, metrics = disc_step(state, latents, reals)
            else:
                state, metrics = gen_step(state, latents, reals, warmed)
            step += 1
            if step % 10 == 0:
                logger.log({k: float(v) for k, v in metrics.items()}, step)
            if demo_batch is not None and step % args.demo_every == 0:
                try:  # media must never take down a training run
                    run_demo(step)
                except Exception as e:  # pragma: no cover
                    print(f"[train_ldm] demo failed at step {step}: {e}")
            if step >= max_steps:
                break
        epoch += 1
        ckpt.save(state, step,
                  {"train/loss": float(metrics.get("train/loss", np.inf))})
    logger.close()
    print(f"finished {step} steps; checkpoints in {args.workdir}")


if __name__ == "__main__":
    main()
