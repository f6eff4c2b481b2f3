"""Sampler-efficiency study with a sign-off protocol: quality vs NFE.

Compares the reference sampling protocol (PC, reverse-diffusion + ald2,
NFE = 2N -- reference: src/evaluate_mp.py:313-323) against the AB2
multistep sampler (NFE = N+1, an efficiency extension beyond the
reference) and reduced step counts, on a model trained by
examples/train_synthetic.py --save-params.

Protocol (the acceptance rule a replacement sampler must meet):
* >= 5 independent sampling seeds per configuration over a fixed item
  set; per-config mean SI-SDR and a 95% CI over seeds (t-interval).
* Baseline is the reference protocol PC@N=30 (NFE 60).
* **Sign-off rule**: a cheaper configuration is ACCEPTED when the 95%
  upper confidence bound of its mean quality deficit
  (si_sdr[pc_N30] - si_sdr[config]) is <= 0.5 dB. The deficit CI uses
  per-seed pairing (same sampling seed for both configs).

Writes the full study to --out (docs/nfe_study.json is the committed
artifact) including per-seed values, CIs, deficits and accept/reject
per configuration.

    python examples/nfe_study.py --params /tmp/syn10k_ema.npz \
        --out docs/nfe_study.json
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

import jax.numpy as jnp
import numpy as np

from ditsep_tpu.configs import CONFIG_FAMILIES, build_diffsep_trainer, override
from ditsep_tpu.data import SyntheticMixDataset, max_collator
from ditsep_tpu.training.losses import si_sdr_pit
from ditsep_tpu.utils.checkpoint import load_params_npz

# two-sided 97.5% Student-t quantiles for small sample sizes (df 1..30)
_T975 = [12.706, 4.303, 3.182, 2.776, 2.571, 2.447, 2.365, 2.306, 2.262,
         2.228, 2.201, 2.179, 2.160, 2.145, 2.131, 2.120, 2.110, 2.101,
         2.093, 2.086, 2.080, 2.074, 2.069, 2.064, 2.060, 2.056, 2.052,
         2.048, 2.045, 2.042]


def _mean_ci(vals):
    """(mean, 95% CI half-width) via the Student-t interval."""
    v = np.asarray(vals, np.float64)
    n = len(v)
    if n < 2:
        return float(v.mean()), float("nan")
    t = _T975[min(n - 1, len(_T975)) - 1]
    return float(v.mean()), float(t * v.std(ddof=1) / math.sqrt(n))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", required=True)
    p.add_argument("--nf", type=int, default=32)
    p.add_argument("--len-s", type=float, default=4.0)
    p.add_argument("--n-items", type=int, default=8)
    p.add_argument("--n-seeds", type=int, default=5)
    p.add_argument("--accept-delta-db", type=float, default=0.5,
                   help="max tolerated mean SI-SDR deficit vs PC@30 "
                        "(upper 95% confidence bound)")
    p.add_argument("--out", default=None, help="JSON artifact path")
    args = p.parse_args()

    cfg = override(CONFIG_FAMILIES["diffsep"](), {
        "model.score_model.nf": args.nf,
        "model.score_model.ch_mult": (1, 1, 2, 2),
        "model.score_model.attn_resolutions": (32,),
    })
    trainer = build_diffsep_trainer(cfg)
    test_ds = SyntheticMixDataset(n_items=args.n_items,
                                  min_len_s=args.len_s,
                                  max_len_s=args.len_s, seed=10_000)
    items = [test_ds[j] for j in range(len(test_ds))]
    mix_b, tgt_b = max_collator(items)
    mix_j, tgt_j = jnp.asarray(mix_b), jnp.asarray(tgt_b)

    key = jax.random.PRNGKey(0)
    template = trainer.model.init(
        key, tgt_j[:1], jnp.full((1,), 0.5), mix_j[:1])
    params = {"params": load_params_npz(args.params, template["params"])}

    def si(est):
        return float(jnp.mean(si_sdr_pit(
            est, tgt_j, zero_mean=True, clamp_db=30.0)))

    configs = [
        ("pc_N30", dict(N=30, sampler="pc"), 60),   # reference protocol
        ("pc_N15", dict(N=15, sampler="pc"), 30),
        ("pc_N8", dict(N=8, sampler="pc"), 16),
        ("ab2_N30", dict(N=30, sampler="ab2"), 30),
        ("ab2_N15", dict(N=15, sampler="ab2"), 15),
        ("ab2_N8", dict(N=8, sampler="ab2"), 8),
    ]
    per_seed = {}
    for name, kwargs, nfe in configs:
        f = jax.jit(lambda p, k, m, kw=kwargs: trainer.separate(
            p, k, m, **kw)[0])
        vals = []
        for s in range(args.n_seeds):
            est = f(params, jax.random.PRNGKey(100 + s), mix_j)
            vals.append(si(est))
        per_seed[name] = vals
        mean, ci = _mean_ci(vals)
        print(json.dumps({name: {"nfe": nfe, "si_sdr_mean": round(mean, 3),
                                 "si_sdr_ci95": round(ci, 3)}}), flush=True)

    base = np.asarray(per_seed["pc_N30"])
    results = {}
    for name, kwargs, nfe in configs:
        vals = per_seed[name]
        mean, ci = _mean_ci(vals)
        deficit = base - np.asarray(vals)  # paired by seed
        d_mean, d_ci = _mean_ci(deficit)
        upper = d_mean + (0.0 if math.isnan(d_ci) else d_ci)
        results[name] = {
            "nfe": nfe,
            "si_sdr_mean": round(mean, 3),
            "si_sdr_ci95": round(ci, 3),
            "si_sdr_per_seed": [round(v, 3) for v in vals],
            "deficit_vs_pc_N30_mean": round(d_mean, 3),
            "deficit_vs_pc_N30_ci95": round(d_ci, 3),
            "deficit_upper95": round(upper, 3),
            "accepted": bool(upper <= args.accept_delta_db),
        }

    mix_rep = jnp.broadcast_to(mix_j, tgt_j.shape)
    study = {
        "protocol": {
            "n_seeds": args.n_seeds,
            "n_items": args.n_items,
            "len_s": args.len_s,
            "accept_rule": ("accepted iff upper 95% CI bound of the "
                            "seed-paired SI-SDR deficit vs pc_N30 <= "
                            f"{args.accept_delta_db} dB"),
            "model_nf": args.nf,
            "data": "SyntheticMixDataset (band-split synthetic mixtures; "
                    "real-data sign-off requires WSJ0/LibriMix, absent in "
                    "this image)",
        },
        "mixture_baseline_si_sdr": round(si(mix_rep), 3),
        "configs": results,
    }
    print(json.dumps(study))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(study, f, indent=2)


if __name__ == "__main__":
    main()
