"""Latent-pipeline separation throughput (VERDICT r3 item 3).

End-to-end: VAE encode -> 30-step latent PC sampling ('ald' corrector,
reference: src/diffsep_latent.py:471-487) -> VAE decode, at the flagship
config (OobleckVAE oobleck_finetune.json: hop 2048 / latent 64 /
channels 128; latent NCSN++ nf=128 ch_mult (1,2,2), reference:
src/config/latent_diffsep_ouve/model/default.yaml). This is the thesis's
core contribution — separation in the 2048x-compressed latent space
(reference: src/evaluate_latent.py) — and the framework's fastest
separation path.

The reference ships NO latent runtime artifact (results/ only covers the
waveform families), so vs_baseline is against the same published
waveform number every bench uses (0.273 utt/s, BASELINE.md).

    python scripts/latent_bench.py [--out docs/latent_bench_r04.json]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", str(ROOT / ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

BASELINE_UTT_PER_S = 1.0 / 3.659  # reference waveform headline (BASELINE.md)
UTT_SECONDS = 8.415               # mean test-utterance length (summary len_s)
FS = 8000
N = 30


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None,
                   help="also write the result JSON here")
    p.add_argument("--batch", type=int,
                   default=int(os.environ.get("BENCH_BATCH", "32")))
    p.add_argument("--reps", type=int,
                   default=int(os.environ.get("BENCH_REPS", "3")))
    p.add_argument("--f32", action="store_true",
                   help="f32 compute (default bf16, same policy as "
                        "bench.py — validated 47-80 dB vs f32)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model sizes (pipeline smoke on CPU; the "
                        "flagship config takes >10 min to compile there)")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ditsep_tpu.models import LatentScoreModelNCSNpp
    from ditsep_tpu.models.oobleck import OobleckVAE
    from ditsep_tpu.sdes import OUVESDE
    from ditsep_tpu.training import DiffSepConfig, LatentDiffSepTrainer

    net_dtype = None if args.f32 else jnp.bfloat16
    if args.tiny:
        vae = OobleckVAE(channels=8, latent_dim=4, c_mults=(1, 2),
                         strides=(4, 8), dtype=net_dtype)
        model = LatentScoreModelNCSNpp(
            num_sources=2, nf=16, ch_mult=(1, 2), num_res_blocks=1,
            attn_resolutions=(), image_size=4, centered=True,
            max_latent_length=4, dtype=net_dtype)
    else:
        vae = OobleckVAE(channels=128, latent_dim=64,
                         c_mults=(1, 2, 4, 8, 16),
                         strides=(2, 4, 4, 8, 8), dtype=net_dtype)
        model = LatentScoreModelNCSNpp(
            num_sources=2, nf=128, ch_mult=(1, 2, 2), num_res_blocks=2,
            attn_resolutions=(16,), image_size=64, centered=True,
            max_latent_length=4, dtype=net_dtype)
    trainer = LatentDiffSepTrainer(
        model=model,
        sde=OUVESDE(theta=1.5, sigma_min=0.96, sigma_max=10.0, N=N),
        vae=vae, cfg=DiffSepConfig(n_speakers=2))

    t_len = int(UTT_SECONDS * FS)
    key = jax.random.PRNGKey(0)

    def build(batch):
        mix = jax.random.normal(key, (batch, 1, t_len)) * 0.1
        vae_params = jax.jit(vae.init)(key, mix[:1])
        mix_lat, _ = trainer.encode(vae_params, None, mix[:1], None)
        params = jax.jit(model.init)(key,
                                     jnp.tile(mix_lat, (1, 2, 1, 1)),
                                     jnp.full((1,), 0.5), mix_lat)

        # params as jit ARGUMENTS (closure constants break/slow the
        # remote-compile tunnel — same policy as bench.py)
        @jax.jit
        def sep(p, vp, k, y):
            return trainer.separate_latent(p, vp, k, y,
                                           target_dim=y.shape[-1], N=N)[0]

        est = sep(params, vae_params, jax.random.PRNGKey(1), mix)
        # host read = the only reliable fence on the axon tunnel
        float(np.asarray(jnp.mean(est.astype(jnp.float32))))
        assert est.shape == (batch, 2, t_len), est.shape
        return sep, params, vae_params, mix

    batch = args.batch
    while True:
        try:
            sep, params, vae_params, mix = build(batch)
            break
        except Exception as e:
            msg = str(e)
            if batch > 1 and ("exceed memory" in msg
                              or "RESOURCE_EXHAUSTED" in msg
                              or "Allocation" in msg):
                batch //= 2
                continue
            raise

    t0 = time.perf_counter()
    for i in range(args.reps):
        est = sep(params, vae_params, jax.random.PRNGKey(2 + i), mix)
        float(np.asarray(jnp.mean(est.astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / args.reps

    utt_per_s = batch / dt
    result = {
        "metric": "latent_pc30_separation_throughput",
        "value": round(utt_per_s, 4),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_s / BASELINE_UTT_PER_S, 3),
        "batch": batch,
        "utt_seconds": UTT_SECONDS,
        "nfe": N * 2,
        "dtype": "f32" if args.f32 else "bf16",
        "platform": jax.devices()[0].platform,
        "device": str(jax.devices()[0]),
        "model": "tiny-smoke" if args.tiny else "flagship",
        "note": ("end-to-end encode -> latent PC('ald', N=30) -> decode"
                 + (", TINY smoke sizes (not a benchmark)" if args.tiny
                    else ", flagship oobleck_finetune VAE + nf=128 latent"
                         " NCSN++")
                 + "; vs_baseline is the reference's published WAVEFORM "
                   "runtime (it ships no latent runtime artifact)"),
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
