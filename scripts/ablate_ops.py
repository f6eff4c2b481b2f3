"""Op-class ablations of the NCSN++ score call on the real TPU.

Decides where kernel-level effort should go by removing one op class at
a time (semantics-breaking -- PROFILING ONLY):
  * baseline          -- full score call (bf16, bench shapes)
  * no_norm           -- GroupNorm -> identity (DITSEP_ABLATE_NORM=1)
  * naive_fir         -- FIR resampling -> naive nearest/avg resampling

Each variant's delta against baseline bounds the achievable win from
fusing/eliminating that op class (e.g. a fused GroupNorm+conv Pallas
kernel can save at most the no_norm delta).

Run: python scripts/ablate_ops.py   (run each variant in a FRESH process
because the norm ablation is an import-time env knob):
  python scripts/ablate_ops.py baseline
  DITSEP_ABLATE_NORM=1 python scripts/ablate_ops.py no_norm
  python scripts/ablate_ops.py naive_fir
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
                  os.environ.get("JAX_CACHE_DIR", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

FS = 8000
UTT_SECONDS = 8.415
BATCH = int(os.environ.get("BENCH_BATCH", "16"))


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "baseline"
    from ditsep_tpu.models import ScoreModelNCSNpp

    fir = variant != "naive_fir"
    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             fir=fir, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    t_len = int(UTT_SECONDS * FS)
    mix = jax.random.normal(key, (BATCH, 1, t_len))
    xt = jax.random.normal(key, (BATCH, 2, t_len))
    tc = jnp.full((BATCH,), 0.5)
    params = jax.jit(model.init)(key, xt, tc, mix)

    @jax.jit
    def score_once(p, x, t, y):
        return model.apply(p, x, t, y)

    out = score_once(params, xt, tc, mix)
    float(np.asarray(jnp.mean(out.astype(jnp.float32))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = score_once(params, xt, tc, mix)
        float(np.asarray(jnp.mean(out.astype(jnp.float32))))
        ts.append(time.perf_counter() - t0)
    rec = {"variant": variant, "batch": BATCH,
           "norm_ablated": os.environ.get("DITSEP_ABLATE_NORM") == "1",
           "score_call_s": round(float(np.median(ts)), 4)}
    print(json.dumps(rec))
    path = "docs/ablate_ops.json"
    data = []
    if os.path.exists(path):
        data = json.load(open(path))
    data = [d for d in data if d["variant"] != variant] + [rec]
    with open(path, "w") as f:
        json.dump(data, f, indent=1)


if __name__ == "__main__":
    main()
