"""Latent-domain score training entry
(reference: src/train_diffsep_latent.py:49-158).

The VAE weights come from --vae-params (npz exported by
ditsep_tpu.utils.checkpoint.save_params_npz or imported from a torch
checkpoint via import_oobleck_params); absent that, random VAE weights are
used (smoke runs only).
"""
from __future__ import annotations

import argparse
import dataclasses

import jax
import jax.numpy as jnp

from ditsep_tpu.cli.common import (add_common_args, add_train_args,
                                   load_config, make_dataset,
                                   make_demo_callbacks)
from ditsep_tpu.configs import build_latent_trainer
from ditsep_tpu.training.loop import fit


@dataclasses.dataclass
class _VAEBoundTrainer:
    """Adapter giving LatentDiffSepTrainer the fit()-loop interface
    (train_step/val_* with the VAE params closed over)."""

    trainer: object
    vae_params: object

    @property
    def model(self):
        return self.trainer.model

    def init_state(self, params):
        return self.trainer.init_state(params)

    def train_step(self, state, key, batch):
        return self.trainer.train_step_latent(
            state, self.vae_params, key, batch)

    def val_score_loss(self, params, key, batch):
        mix, target = batch
        return self.trainer.training_loss_latent(
            params, self.vae_params, key, mix, target, train=False)

    def val_separation_metrics(self, params, key, batch, **kw):
        return self.trainer.val_metrics_latent(
            params, self.vae_params, key, batch, **kw)

    def separate(self, params, key, mix, **kw):
        """Waveform-level separation (encode -> latent PC -> decode), so
        SeparationDemoCallback works on the latent family too."""
        return self.trainer.separate_latent(
            params, self.vae_params, key, mix,
            target_dim=mix.shape[-1], **kw)


def init_vae_params(trainer, vae_params_path, key):
    example = jnp.zeros((1, 1, trainer.vae.downsampling_ratio * 4))
    # jitted: eager init is one RPC per op on a remote-attached TPU
    # (docs/tpu_notes.md), minutes for the flagship VAE
    variables = jax.jit(trainer.vae.init)(key, example)
    if vae_params_path:
        from ditsep_tpu.utils.checkpoint import load_params_npz
        return {"params": load_params_npz(
            vae_params_path, variables["params"])}
    return variables


def main(argv=None):
    p = add_train_args(add_common_args(
        argparse.ArgumentParser(description=__doc__)))
    p.set_defaults(config="latent_diffsep_ouve")
    p.add_argument("--vae-params", default=None,
                   help="npz with OobleckVAE params")
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    trainer = build_latent_trainer(cfg)
    vae_params = init_vae_params(trainer, args.vae_params,
                                 jax.random.PRNGKey(args.seed))
    bound = _VAEBoundTrainer(trainer, vae_params)

    train_ds = make_dataset(cfg, "train", args.data_path, args.synthetic,
                            synthetic_items=args.synthetic_items,
                            synthetic_len_s=args.synthetic_len_s)
    val_ds = make_dataset(cfg, "val", args.data_path, args.synthetic,
                          synthetic_len_s=args.synthetic_len_s,
                          synthetic_items=4)
    mesh = None
    if args.mesh:
        from ditsep_tpu.parallel import make_mesh
        mesh = make_mesh()
    # init score-model params on an encoded example
    key = jax.random.PRNGKey(args.seed)
    mix0, tgt0 = train_ds[0]
    mix_lat, tgt_lat = trainer.encode(
        vae_params, None, jnp.asarray(mix0[None]), jnp.asarray(tgt0[None]))
    params = trainer.model.init(
        key, tgt_lat, jnp.full((1,), 0.5), mix_lat)

    batch_size = args.batch_size or cfg["datamodule"]["train"]["batch_size"]
    fs = cfg["datamodule"].get("fs", 8000)
    fit(bound, train_ds, val_ds, workdir=args.workdir,
        max_epochs=args.max_epochs or 1000, batch_size=batch_size,
        mesh=mesh, seed=args.seed,
        valid_max_sep_batches=cfg["model"].get("valid_max_sep_batches", 2),
        max_steps=args.max_steps, init_params=params, resume=args.resume,
        callbacks=make_demo_callbacks(val_ds, args.demo_every, fs=fs),
        media_fs=fs)


if __name__ == "__main__":
    main()
