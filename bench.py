"""Benchmark: utterance throughput of 30-step PC-sampler separation.

The reference's headline number (BASELINE.md): 3.659 s per 8.415 s utterance
(0.273 utt/s) for N=30, snr=0.5, corrector_steps=1, denoise=True (NFE=60),
batch_size=1 on a single CUDA GPU (reference: results/..._summary.json,
timing code src/evaluate_mp.py:325-327).

Here the whole 30-step loop is ONE jitted lax.scan and utterances are
batched, so the chip stays saturated. Prints one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import time

import jax
import jax.numpy as jnp

# persistent compilation cache: the 30-step jitted sampler is a large XLA
# program (~5-40 min first compile); cache it across processes/rounds
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

BASELINE_UTT_PER_S = 1.0 / 3.659  # reference: librimix_test_summary.json
UTT_SECONDS = 8.415               # mean test-utterance length (summary len_s)
FS = 8000


def main():
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE, pc_sample

    # flagship config: icassp-separation experiment (nf=128)
    # (reference: src/config/diffsep/experiment/icassp-separation.yaml:16)
    # bf16 compute by default: validated against f32 through the full
    # 30-step sampler at 47-80 dB SI-SDR agreement (mean 66 dB), far
    # inside the +-0.1 dB parity budget; BENCH_DTYPE=f32 to override.
    net_dtype = (None if os.environ.get("BENCH_DTYPE") == "f32"
                 else jnp.bfloat16)
    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=net_dtype)
    sde = MixSDE(N=30)

    t_len = int(UTT_SECONDS * FS)
    # bs 32 measured 1.5% over bs 16 on v5e (1.968-1.971 vs 1.941-1.942
    # utt/s, 5-rep runs); the OOM fallback below halves it on smaller HBM
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    dtype = jnp.float32
    import numpy as np

    key = jax.random.PRNGKey(0)

    def build(batch):
        mix = jax.random.normal(key, (batch, 1, t_len), dtype=dtype)
        xt = jax.random.normal(key, (batch, 2, t_len), dtype=dtype)
        tcond = jnp.full((batch,), 0.5, dtype=dtype)
        # jit the init: eager init dispatches thousands of tiny ops,
        # which is slow over a remote-TPU tunnel
        params = jax.jit(model.init)(key, xt, tcond, mix)

        # params ride as jit ARGUMENTS, not closures: the axon tunnel
        # ships compiled programs over HTTP, and closed-over params
        # become embedded constants (hundreds of MB -> slow/failing
        # remote compiles)
        @jax.jit
        def sample(params, k, y):
            score_fn = lambda x, t, c: model.apply(params, x, t, c)
            est, nfe = pc_sample(
                sde, score_fn, k, y, predictor="reverse_diffusion",
                corrector="ald2", N=30, snr=0.5, corrector_steps=1,
                denoise=True, eps=0.03, n_spkrs=2)
            return est

        # warmup/compile; a HOST READ (not just block_until_ready) is
        # required to truly sync -- the axon runtime's block_until_ready
        # can return before remote execution finishes right after
        # compilation
        est = sample(params, jax.random.PRNGKey(1), mix)
        float(np.asarray(jnp.mean(est.astype(jnp.float32))))
        return sample, params, mix

    # the attached chip varies by round (v5p 95 GB vs v5e 16 GB): halve
    # the batch on HBM overflow until the program fits
    while True:
        try:
            sample, params, mix = build(batch)
            break
        except Exception as e:  # jaxlib raises backend-specific errors
            msg = str(e)
            if batch > 1 and ("exceed memory" in msg
                              or "RESOURCE_EXHAUSTED" in msg
                              or "Allocation" in msg):
                batch //= 2
                continue
            raise

    reps = int(os.environ.get("BENCH_REPS", "3"))
    t0 = time.perf_counter()
    for i in range(reps):
        est = sample(params, jax.random.PRNGKey(2 + i), mix)
        float(np.asarray(jnp.mean(est.astype(jnp.float32))))
    dt = (time.perf_counter() - t0) / reps

    utt_per_s = batch / dt
    print(json.dumps({
        "metric": "pc30_separation_throughput",
        "value": round(utt_per_s, 4),
        "unit": "utt/s",
        "vs_baseline": round(utt_per_s / BASELINE_UTT_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
