"""Measure the input-pipeline prefetch uplift on the attached TPU.

VERDICT round 1 flagged the synchronous prepare-then-step loop (host
collation blocking the device between steps). fit() now overlaps via a
background prefetch thread; this script times the same jitted train step
driven (a) synchronously and (b) through _prefetch, on real TPU
hardware, and reports steps/s for both.

Run: python scripts/prefetch_bench.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    from ditsep_tpu.data import SyntheticMixDataset
    from ditsep_tpu.data.wsj0_mix import BucketedLoader
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE
    from ditsep_tpu.training import DiffSepConfig, DiffSepTrainer
    from ditsep_tpu.training.loop import _prefetch

    batch = int(os.environ.get("BENCH_BATCH", "8"))
    steps = int(os.environ.get("BENCH_STEPS", "30"))
    model = ScoreModelNCSNpp(num_sources=2, nf=64,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=jnp.bfloat16)
    tr = DiffSepTrainer(model=model, sde=MixSDE(),
                        cfg=DiffSepConfig(init_hack=5, lr=1e-4))
    ds = SyntheticMixDataset(n_items=batch * 8, min_len_s=4.0,
                             max_len_s=4.0)
    loader = BucketedLoader(ds, batch_size=batch, n_buckets=1,
                            multiple=4096, shuffle=True, seed=0)

    key = jax.random.PRNGKey(0)
    mix0, tgt0 = ds[0]
    params = jax.jit(model.init)(key, jnp.asarray(tgt0[None]),
                                 jnp.full((1,), 0.5),
                                 jnp.asarray(mix0[None]))
    state = tr.init_state(params)
    step_fn = jax.jit(tr.train_step)

    def endless(loader, n):
        count = 0
        while count < n:
            for item in loader:
                yield item
                count += 1
                if count >= n:
                    return

    prepare = lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1]))

    # warmup/compile
    b0 = prepare(next(iter(loader)))
    state, m = step_fn(state, key, b0)
    float(np.asarray(m["train/score_loss"]))

    results = {"batch": batch, "steps": steps}
    for mode in ("sync", "prefetch"):
        s = state
        it = endless(loader, steps)
        stream = (_prefetch(it, prepare) if mode == "prefetch"
                  else (prepare(b) for b in it))
        t0 = time.perf_counter()
        for bt in stream:
            key_, key = jax.random.split(key)
            s, m = step_fn(s, key_, bt)
        float(np.asarray(m["train/score_loss"]))  # sync
        dt = time.perf_counter() - t0
        results[f"{mode}_steps_per_s"] = round(steps / dt, 3)
    results["uplift_pct"] = round(
        100.0 * (results["prefetch_steps_per_s"]
                 / results["sync_steps_per_s"] - 1.0), 1)
    print(json.dumps(results, indent=1))
    with open("docs/prefetch_bench.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
