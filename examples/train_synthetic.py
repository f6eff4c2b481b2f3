"""End-to-end pipeline validation: train a small DiffSep model on synthetic
mixtures and verify separation quality improves over the mixture baseline.

Runs on whatever backend JAX selects (TPU if attached). Usage:

    python examples/train_synthetic.py --steps 1500 --nf 32
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=1500)
    p.add_argument("--nf", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--len-s", type=float, default=4.0)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--eval-N", type=int, default=30)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--save-params", default=None,
                   help="npz path for the trained (EMA) params")
    p.add_argument("--mask-padding", action="store_true",
                   help="train with padding-robust masked normalization "
                        "(docs/pad_dilution_r03.md)")
    p.add_argument("--eval-every", type=int, default=0,
                   help="if >0, run the separation eval every N steps and "
                        "print an interim JSON line (and snapshot "
                        "--save-params), so a long run killed mid-way "
                        "still yields a measurement")
    args = p.parse_args()

    cfg = override(CONFIG_FAMILIES["diffsep"](), {
        "model.score_model.nf": args.nf,
        "model.score_model.ch_mult": (1, 1, 2, 2),
        "model.score_model.attn_resolutions": (32,),
        "model.score_model.mask_padding": args.mask_padding,
        "model.lr": args.lr,
    })
    trainer = build_diffsep_trainer(cfg)

    train_ds = SyntheticMixDataset(n_items=args.n_train,
                                   min_len_s=args.len_s,
                                   max_len_s=args.len_s, seed=0)
    test_ds = SyntheticMixDataset(n_items=8, min_len_s=args.len_s,
                                  max_len_s=args.len_s, seed=10_000)

    key = jax.random.PRNGKey(0)
    mix0, tgt0 = train_ds[0]
    params = jax.jit(trainer.model.init)(
        key, jnp.asarray(tgt0[None]), jnp.full((1,), 0.5),
        jnp.asarray(mix0[None]))
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    print(f"model params: {n_params/1e6:.2f}M, devices: {jax.devices()}")

    state = trainer.init_state(params)
    step_fn = jax.jit(trainer.train_step)

    # eval harness built up-front so interim (--eval-every) and final
    # evaluations share one compiled sampler
    items = [test_ds[j] for j in range(len(test_ds))]
    mix_b, tgt_b = max_collator(items)
    mix_j, tgt_j = jnp.asarray(mix_b), jnp.asarray(tgt_b)
    sep = jax.jit(lambda p, k, m: trainer.separate(
        p, k, m, N=args.eval_N)[0])
    mix_rep = jnp.broadcast_to(mix_j, tgt_j.shape)
    si_mix = float(jnp.mean(si_sdr_pit(mix_rep, tgt_j, zero_mean=True,
                                       clamp_db=30.0)))

    def run_eval(st):
        si = {}
        for name, p in [("params", st.params), ("ema", st.ema_params)]:
            est = sep(p, jax.random.PRNGKey(1), mix_j)
            si[name] = float(jnp.mean(si_sdr_pit(
                est, tgt_j, zero_mean=True, clamp_db=30.0)))
        return si

    def snapshot(st):
        if args.save_params:
            from ditsep_tpu.utils.checkpoint import save_params_npz
            save_params_npz(args.save_params, st.ema_params["params"])

    order = np.arange(len(train_ds))
    t0 = time.time()
    i = 0
    losses = []
    while i < args.steps:
        np.random.default_rng(i).shuffle(order)
        for s in range(0, len(order) - args.batch + 1, args.batch):
            items = [train_ds[int(j)] for j in order[s:s + args.batch]]
            mix_b, tgt_b = max_collator(items)
            key, sub = jax.random.split(key)
            state, m = step_fn(state, sub,
                               (jnp.asarray(mix_b), jnp.asarray(tgt_b)))
            i += 1
            if i % 100 == 0:
                loss = float(m["train/score_loss"])
                losses.append(loss)
                print(f"step {i}: loss {loss:.4f} "
                      f"({i/(time.time()-t0):.2f} steps/s)", flush=True)
            if args.eval_every and i % args.eval_every == 0 \
                    and i < args.steps:
                si_i = run_eval(state)
                snapshot(state)
                print(json.dumps({
                    "interim_step": i,
                    "si_sdr_separated": round(si_i["params"], 3),
                    "si_sdr_separated_ema": round(si_i["ema"], 3),
                    "si_sdr_mixture_baseline": round(si_mix, 3),
                    "improvement_db": round(si_i["params"] - si_mix, 3),
                }), flush=True)
            if i >= args.steps:
                break

    # -- evaluation: separation SI-SDR vs mixture baseline ------------------
    si = run_eval(state)
    result = {
        "steps": args.steps,
        "final_loss": losses[-1] if losses else None,
        "si_sdr_mixture_baseline": round(si_mix, 3),
        "si_sdr_separated": round(si["params"], 3),
        "si_sdr_separated_ema": round(si["ema"], 3),
        "improvement_db": round(si["params"] - si_mix, 3),
    }
    print(json.dumps(result))
    if args.save_params:
        snapshot(state)
        print(f"saved EMA params to {args.save_params}")


if __name__ == "__main__":
    main()
