"""Sampler-efficiency study: separation quality vs NFE on a trained model.

Compares the reference protocol (PC, reverse-diffusion + ald2, NFE =
2N) against the AB2 multistep sampler (NFE = N+1) and reduced step
counts, using params trained by examples/train_synthetic.py --save-params.

    python examples/nfe_study.py --params /tmp/syn10k_ema.npz
"""
from __future__ import annotations

import argparse
import json
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--params", required=True)
    p.add_argument("--nf", type=int, default=32)
    p.add_argument("--len-s", type=float, default=4.0)
    p.add_argument("--n-items", type=int, default=8)
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
        return round(float(jnp.mean(si_sdr_pit(
            est, tgt_j, zero_mean=True, clamp_db=30.0))), 3)

    results = {}
    for name, kwargs, nfe in [
        ("pc_N30", dict(N=30, sampler="pc"), 60),
        ("pc_N15", dict(N=15, sampler="pc"), 30),
        ("pc_N8", dict(N=8, sampler="pc"), 16),
        ("ab2_N30", dict(N=30, sampler="ab2"), 30),
        ("ab2_N15", dict(N=15, sampler="ab2"), 15),
    ]:
        f = jax.jit(lambda p, k, m, kw=kwargs: trainer.separate(
            p, k, m, **kw)[0])
        est = f(params, jax.random.PRNGKey(1), mix_j)
        results[name] = {"nfe": nfe, "si_sdr": si(est)}
        print(json.dumps({name: results[name]}), flush=True)
    mix_rep = jnp.broadcast_to(mix_j, tgt_j.shape)
    results["mixture_baseline"] = {"nfe": 0, "si_sdr": si(mix_rep)}
    print(json.dumps(results))


if __name__ == "__main__":
    main()
