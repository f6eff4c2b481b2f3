"""Streaming-separation benchmark on the attached TPU.

Measures the bounded-latency real-time path (serving/streaming.py) with
the flagship nf=128 bf16 sampler: a long synthetic mixture is pushed in
small blocks through StreamingSeparator (window 8 s, overlap 1 s) and
the realtime factor, per-window sampler cost, and latency budget are
reported. Writes docs/streaming_bench.json.

    python scripts/streaming_bench.py
    STREAM_BENCH_SECONDS=60 python scripts/streaming_bench.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(
                      os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

FS = 8000
CHUNK_S = 8.0
OVERLAP_S = 1.0


def main():
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE, pc_sample
    from ditsep_tpu.serving import StreamingSeparator

    stream_s = float(os.environ.get("STREAM_BENCH_SECONDS", 120))
    chunk = int(CHUNK_S * FS)
    overlap = int(OVERLAP_S * FS)

    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=jnp.bfloat16)
    sde = MixSDE(N=30)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(key, jnp.zeros((1, 2, chunk)),
                                 jnp.full((1,), 0.5),
                                 jnp.zeros((1, 1, chunk)))

    @jax.jit
    def sample(params, k, y):
        score_fn = lambda x, t, c: model.apply(params, x, t, c)
        est, _ = pc_sample(sde, score_fn, k, y, N=30, snr=0.5,
                           corrector="ald2", corrector_steps=1,
                           denoise=True)
        return est.astype(jnp.float32)

    window_times = []

    def sep_fn(k, mix):
        t0 = time.perf_counter()
        out = sample(params, k, jnp.asarray(mix))
        out.block_until_ready()
        window_times.append(time.perf_counter() - t0)
        return out

    # warm up / compile (excluded from timing)
    sep_fn(key, np.zeros((1, 1, chunk), np.float32))
    window_times.clear()

    rng = np.random.default_rng(0)
    t_total = int(stream_s * FS)
    mix = (rng.standard_normal(t_total) * 0.1).astype(np.float32)
    block = int(0.25 * FS)

    sep = StreamingSeparator(sep_fn, chunk_samples=chunk,
                             overlap_samples=overlap, n_src=2, seed=1)
    emitted = 0
    t0 = time.perf_counter()
    for s in range(0, t_total, block):
        emitted += sep.push(mix[s:s + block]).shape[-1]
    emitted += sep.flush().shape[-1]
    wall = time.perf_counter() - t0
    assert emitted == t_total

    result = {
        "stream_seconds": stream_s,
        "chunk_seconds": CHUNK_S,
        "overlap_seconds": OVERLAP_S,
        "block_seconds": 0.25,
        "n_windows": len(window_times),
        "sampler_s_per_window": float(np.mean(window_times)),
        "wall_s": wall,
        "realtime_factor": t_total / FS / wall,
        "latency_budget_s": sep.latency_samples / FS,
        "note": "flagship nf=128 bf16 NFE-60 PC sampler, one v5e chip; "
                "realtime_factor = audio seconds separated per wall "
                "second through the streaming path. wall - "
                "n_windows*sampler_s is dominated by the per-window "
                "device->host result download over this box's TPU "
                "tunnel (~0.5 MB/window); a locally-attached chip "
                "amortizes it to noise",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "streaming_bench.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
