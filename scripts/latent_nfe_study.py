"""NFE-reduction study on the LATENT separation pipeline.

Round 3 quantified AB2-vs-PC NFE efficiency on the WAVEFORM path only
(docs/nfe_study.json, synthetic sign-off); the thesis's core pipeline is
the latent one (reference: src/evaluate_latent.py). This script sweeps
sampler step counts on the latent model trained by
scripts/latent_long_train.py (same synthetic tonal-mix task, same val
stream) and records SI-SDR + measured throughput per operating point,
with the same >=5-seed / 95%-CI discipline as docs/nfe_study.json:

* PC ('reverse_diffusion' + 'ald', the reference's latent sampler,
  src/diffsep_latent.py:471-487) at N in {30, 15, 8}  -> NFE = 2N
* AB2 multistep (our NFE-efficiency extension) at N in {60, 30, 15, 8}
  -> NFE = N (one score call per step)

Each point is sampled with --seeds independent sampling keys; the
sign-off rule is seed-paired against the reference operating point
pc_N30: a point is ACCEPTED iff the upper 95% CI bound of its
seed-paired SI-SDR deficit vs pc_N30 is <= 0.5 dB.

Writes docs/latent_nfe_r05.json. Run AFTER latent_long_train:

    python scripts/latent_nfe_study.py --workdir /tmp/latent_long_train_r05
"""
import argparse
import json
import math
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(ROOT / "scripts"))
from latent_long_train import (FS, OVERRIDES, T_LEN,  # noqa: E402
                               make_batcher, si_sdr_pit_mean)

# two-sided t critical values at 95% for n-1 dof (n = #seeds), so the CI
# is honest at small n (docs/nfe_study.json used the same discipline)
T95 = {2: 12.706, 3: 4.303, 4: 3.182, 5: 2.776, 6: 2.571, 7: 2.447,
       8: 2.365, 9: 2.306, 10: 2.262}


def mean_ci95(vals):
    vals = np.asarray(vals, dtype=np.float64)
    n = len(vals)
    m = float(np.mean(vals))
    if n < 2:
        return m, 0.0
    sd = float(np.std(vals, ddof=1))
    return m, T95.get(n - 1, 1.96) * sd / math.sqrt(n)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/latent_long_train_r05")
    p.add_argument("--out", default=str(ROOT / "docs"
                                        / "latent_nfe_r05.json"))
    p.add_argument("--val-batch", type=int, default=16)
    p.add_argument("--partial",
                   default="/tmp/latent_nfe_partial.json",
                   help="incremental per-point results; completed "
                        "points are skipped on relaunch (tunnel-wedge "
                        "recovery)")
    p.add_argument("--seeds", type=int, default=5)
    p.add_argument("--accept-db", type=float, default=0.5)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ditsep_tpu.configs import latent_diffsep_ouve, override
    from ditsep_tpu.configs.build import build_latent_trainer
    from ditsep_tpu.sdes import ab2_sample
    from ditsep_tpu.utils.checkpoint import load_params_npz

    cfg = override(latent_diffsep_ouve(), OVERRIDES)
    trainer = build_latent_trainer(cfg)
    work = Path(args.workdir)

    # rebuild templates to load the npz trees into
    key = jax.random.PRNGKey(0)
    ex_mix = jnp.zeros((1, 1, T_LEN))
    ex_tgt = jnp.zeros((1, 2, T_LEN))
    vae_t = jax.jit(trainer.vae.init)(key, ex_mix)
    mix_lat, tgt_lat = trainer.encode(vae_t, None, ex_mix, ex_tgt)
    score_t = jax.jit(trainer.model.init)(
        key, tgt_lat, jnp.full((1,), 0.5), mix_lat)
    vae_params = load_params_npz(str(work / "vae.npz"), vae_t)
    score_params = load_params_npz(str(work / "score_ema.npz"), score_t)

    # same val draw as latent_long_train (seed 10_000 stream, rng 99)
    val_batch_fn = make_batcher(256, seed=10_000)
    val_mix, val_tgt = val_batch_fn(np.random.default_rng(99),
                                    args.val_batch)
    val_tgt_np = np.asarray(val_tgt)
    mix_base = si_sdr_pit_mean(
        np.repeat(np.asarray(val_mix), 2, axis=1), val_tgt_np)

    def pc_fn(n):
        return jax.jit(lambda p, vp, k, m: trainer.separate_latent(
            p, vp, k, m, target_dim=T_LEN, N=n)[0])

    def ab2_fn(n):
        def run(p, vp, k, m):
            k_enc, k_samp = jax.random.split(k)
            lat, _ = trainer.encode(vp, k_enc, m, None)
            sf = lambda x, t, y: trainer.model_fwd(p, x, t, y)
            est, _ = ab2_sample(trainer.sde, sf, k_samp, lat, N=n,
                                eps=trainer.cfg.t_eps, denoise=True,
                                n_spkrs=trainer.cfg.n_speakers)
            return trainer.decode(vp, est, T_LEN)
        return jax.jit(run)

    points = ([(f"pc_N{n}", 2 * n, pc_fn(n)) for n in (30, 15, 8)]
              + [(f"ab2_N{n}", n, ab2_fn(n)) for n in (60, 30, 15, 8)])

    # Restartable: the axon tunnel can wedge mid-run (see
    # docs/tpu_notes.md); completed points persist to --partial and are
    # skipped on relaunch, so a supervisor can kill+retry losslessly.
    partial_path = Path(args.partial)
    configs = {}
    per_seed = {}
    if partial_path.exists():
        saved = json.loads(partial_path.read_text())
        configs = saved["configs"]
        per_seed = {k: v["si_sdr_per_seed_full"]
                    for k, v in configs.items()}
        print(f"resuming: {sorted(configs)} done", flush=True)

    for name, nfe, fn in points:
        if name in configs:
            continue
        # warm (compile) outside the timed/scored loop
        jax.block_until_ready(fn(score_params, vae_params,
                                 jax.random.PRNGKey(7), val_mix))
        sdrs, t_total = [], 0.0
        for i in range(args.seeds):
            t0 = time.perf_counter()
            est = fn(score_params, vae_params,
                     jax.random.PRNGKey(7 + i), val_mix)
            jax.block_until_ready(est)
            t_total += time.perf_counter() - t0
            sdrs.append(si_sdr_pit_mean(np.asarray(est), val_tgt_np))
        m, ci = mean_ci95(sdrs)
        per_seed[name] = sdrs
        configs[name] = {
            "nfe": nfe,
            "si_sdr_mean": round(m, 3),
            "si_sdr_ci95": round(ci, 3),
            "si_sdr_per_seed": [round(v, 3) for v in sdrs],
            "si_sdr_per_seed_full": sdrs,  # exact values for the
            # seed-paired deficit CI on resume
            "utt_per_s": round(args.val_batch * args.seeds / t_total, 3),
        }
        print(name, configs[name], flush=True)
        tmp = partial_path.with_suffix(".tmp")
        tmp.write_text(json.dumps({"configs": configs}))
        tmp.replace(partial_path)

    # seed-paired deficits vs the reference operating point pc_N30
    ref = np.asarray(per_seed["pc_N30"])
    for name, cfg_row in configs.items():
        deficit = ref - np.asarray(per_seed[name])
        dm, dci = mean_ci95(deficit)
        upper = dm + dci
        cfg_row["deficit_vs_pc_N30_mean"] = round(dm, 3)
        cfg_row["deficit_vs_pc_N30_ci95"] = round(dci, 3)
        cfg_row["deficit_upper95"] = round(upper, 3)
        cfg_row["accepted"] = bool(upper <= args.accept_db)
        cfg_row.pop("si_sdr_per_seed_full", None)  # resume-internal

    artifact = {
        "protocol": {
            "n_seeds": args.seeds,
            "val_batch": args.val_batch,
            "len_s": T_LEN / FS,
            "accept_rule": ("accepted iff upper 95% CI bound of the "
                            "seed-paired SI-SDR deficit vs pc_N30 <= "
                            f"{args.accept_db} dB"),
            "checkpoint": str(work),
            "data": ("SyntheticTonalMixDataset (harmonic-tone mixtures; "
                     "real-data sign-off requires WSJ0/LibriMix, absent "
                     "in this image)"),
            "backend": str(jax.devices()[0]),
        },
        "mixture_baseline_si_sdr": round(mix_base, 3),
        "configs": configs,
        "note": ("synthetic-data sign-off ONLY (same caveat as "
                 "docs/nfe_study.json): relative NFE efficiency of AB2 "
                 "vs the reference's PC sampler on the LATENT pipeline; "
                 "absolute SI-SDR is task-bound by the from-scratch VAE "
                 "ceiling, see docs/latent_long_train_r05.json"),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
        f.write("\n")
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
