"""Latent-caching entry point: run the separation pipeline over a dataset
and store sampled latents for offline decoder finetuning.

Working re-design of the reference's latent cache generator
(reference: src/ldm.py:296-389 generate_dataset and the broken
scripts/cache_latents.py:29-56, treated as specification). Each item's mix
is encoded, PC-sampled `n_samples_per_item` times, and the latents saved
as npz shards + metadata (restart-safe: metadata refreshes every 10 items).
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.cli.common import add_common_args, load_config, make_dataset
from ditsep_tpu.cli.train_diffsep_latent import init_vae_params
from ditsep_tpu.configs import build_latent_trainer
from ditsep_tpu.data import save_latent_cache, save_latent_metadata


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.set_defaults(config="latent_diffsep_ouve")
    p.add_argument("--vae-params", default=None)
    p.add_argument("--score-params", default=None,
                   help="npz with score-model params")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--n-samples-per-item", type=int, default=1)
    p.add_argument("--sampler-N", type=int, default=30)
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    trainer = build_latent_trainer(cfg)
    key = jax.random.PRNGKey(args.seed)
    vae_params = init_vae_params(trainer, args.vae_params, key)
    ds = make_dataset(cfg, "train", args.data_path, args.synthetic,
                      synthetic_items=args.synthetic_items,
                      synthetic_len_s=args.synthetic_len_s)

    mix0, _ = ds[0]
    mix_lat0, _ = trainer.encode(vae_params, None,
                                 jnp.asarray(mix0[None]), None)
    if args.score_params:
        from ditsep_tpu.utils.checkpoint import load_params_npz
        tmpl = trainer.model.init(key, jnp.zeros(
            (1, trainer.cfg.n_speakers) + mix_lat0.shape[2:]),
            jnp.full((1,), 0.5), mix_lat0)
        params = {"params": load_params_npz(args.score_params,
                                            tmpl["params"])}
    else:
        params = trainer.model.init(key, jnp.zeros(
            (1, trainer.cfg.n_speakers) + mix_lat0.shape[2:]),
            jnp.full((1,), 0.5), mix_lat0)

    @jax.jit
    def _sample_latents(params, vae_params, k, mix):
        k_enc, k_samp = jax.random.split(k)
        mix_lat, _ = trainer.encode(vae_params, k_enc, mix, None)
        from ditsep_tpu.sdes import pc_sample
        est, _ = pc_sample(
            trainer.sde,
            lambda x, t, y: trainer.model_fwd(params, x, t, y),
            k_samp, mix_lat, predictor="reverse_diffusion",
            corrector="ald", N=args.sampler_N,
            snr=trainer.cfg.sampler_snr,
            corrector_steps=trainer.cfg.sampler_corrector_steps,
            denoise=True, eps=trainer.cfg.t_eps,
            n_spkrs=trainer.cfg.n_speakers)
        return est

    def sample_latents(k, mix):
        return _sample_latents(params, vae_params, k, mix)

    done = []
    base = []
    for i in range(len(ds)):
        mix, tgt = ds[i]  # ONE read: latent and stored targets share
        # the exact same random crop (random-cropping datasets re-draw
        # per access)
        for s in range(args.n_samples_per_item):
            key, sub = jax.random.split(key)
            lat = sample_latents(sub, jnp.asarray(mix[None]))
            save_latent_cache(args.out_dir,
                              i * args.n_samples_per_item + s,
                              np.asarray(lat[0]), targets=tgt)
            done.append(i * args.n_samples_per_item + s)
            base.append(i)
        if i % 10 == 0:  # restart-safe metadata (reference: ldm.py:378-382)
            save_latent_metadata(args.out_dir, done,
                                 extra={"base_indices": base})
    save_latent_metadata(args.out_dir, done,
                         extra={"base_indices": base})
    print(f"cached {len(done)} latents to {args.out_dir}")


if __name__ == "__main__":
    main()
