"""Measure score-call wall-clock vs batch on the attached TPU.

The round-2 profile showed ~0.14 s per sampler step at BOTH batch 4 and
batch 16 -- per-step time nearly flat in batch, meaning the chip has
idle capacity at the bench batch. This script pins down the scaling
curve for a single jitted score call (and, optionally, a short sampler)
across batch sizes so the bench batch can sit at the knee.

Run: python scripts/batch_scaling.py  (real TPU; ~1 compile per batch)
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

FS = 8000
UTT_SECONDS = 8.415
T_LEN = int(UTT_SECONDS * FS)


def timed(fn, *args, reps=5):
    out = fn(*args)
    float(np.asarray(jnp.mean(out.astype(jnp.float32))))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.mean(out.astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    from ditsep_tpu.models import ScoreModelNCSNpp

    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    results = {"device": str(jax.devices()[0])}

    @jax.jit
    def score_once(p, x, t, y):
        return model.apply(p, x, t, y)

    for b in [int(v) for v in os.environ.get(
            "BATCHES", "2,4,8,16,24,32").split(",")]:
        try:
            mix = jax.random.normal(key, (b, 1, T_LEN))
            xt = jax.random.normal(key, (b, 2, T_LEN))
            tc = jnp.full((b,), 0.5)
            params = jax.jit(model.init)(key, xt, tc, mix)
            dt = timed(score_once, params, xt, tc, mix)
            results[f"score_b{b}_s"] = round(dt, 4)
            results[f"score_b{b}_per_sample_ms"] = round(1000 * dt / b, 2)
        except Exception as e:
            results[f"score_b{b}_s"] = f"FAILED: {str(e)[:80]}"
    print(json.dumps(results, indent=1))
    with open("docs/batch_scaling.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
