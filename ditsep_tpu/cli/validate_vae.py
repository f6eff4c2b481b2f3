"""Sweep VAE checkpoints, computing reconstruction metrics per checkpoint.

Re-design of the reference's checkpoint-sweep validation
(reference: src/training/validate_stable.py:20-133): for every checkpoint
in a directory, run the autoencoder over the validation set and report
SI-SDR / MRSTFT reconstruction quality as a table.
"""
from __future__ import annotations

import argparse
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.cli.common import add_common_args, load_config, make_dataset
from ditsep_tpu.configs import build_oobleck_vae
from ditsep_tpu.training import si_sdr_pit
from ditsep_tpu.training.auraloss import multi_resolution_stft_loss


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.set_defaults(config="latent_diffsep_ouve")
    p.add_argument("--params-dir", required=True,
                   help="directory of VAE params .npz files to sweep")
    p.add_argument("--n-items", type=int, default=8)
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    vae = build_oobleck_vae(cfg["model"]["vae"])
    ds = make_dataset(cfg, "val", args.data_path, args.synthetic,
                      synthetic_items=args.n_items)
    key = jax.random.PRNGKey(args.seed)
    mix0, _ = ds[0]
    template = vae.init(key, jnp.asarray(mix0[None]))

    files = sorted(Path(args.params_dir).glob("*.npz"))
    if not files:
        raise SystemExit(f"no .npz params under {args.params_dir}")

    @jax.jit
    def roundtrip(params, audio):
        lat = vae.apply(params, audio, method=vae.encode)
        return vae.apply(params, lat, method=vae.decode)

    from ditsep_tpu.utils.checkpoint import load_params_npz
    rows = []
    for f in files:
        params = {"params": load_params_npz(str(f), template["params"])}
        si_vals, stft_vals = [], []
        for i in range(min(args.n_items, len(ds))):
            mix, _ = ds[i]
            t = mix.shape[-1] - (mix.shape[-1] % vae.downsampling_ratio)
            audio = jnp.asarray(mix[None, :, :t])
            rec = roundtrip(params, audio)
            si_vals.append(float(jnp.mean(si_sdr_pit(
                rec, audio, clamp_db=30.0))))
            stft_vals.append(float(multi_resolution_stft_loss(
                rec, audio, fft_sizes=(512, 256), hop_sizes=(128, 64))))
        rows.append({"ckpt": f.name,
                     "si_sdr": round(float(np.mean(si_vals)), 3),
                     "mrstft": round(float(np.mean(stft_vals)), 4)})
        print(json.dumps(rows[-1]))
    best = max(rows, key=lambda r: r["si_sdr"])
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
