"""Serving-engine load benchmark on the attached TPU.

Quantifies what dynamic batching buys a live separation service: offered
concurrency is swept while the engine groups requests into single jitted
30-step PC-sampler calls (flagship nf=128 config, bf16 — identical
compute to bench.py). At concurrency 1 the engine degenerates to the
single-request demo server; at high concurrency its throughput should
approach the offline batched bench (1.97 utt/s on a v5e).

Writes docs/serving_bench.json and prints one JSON line per level.

    python scripts/serving_bench.py            # full sweep on TPU
    SERVE_BENCH_LEVELS="1,8" python scripts/serving_bench.py
"""
import json
import os
import sys
import time
from concurrent.futures import wait

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
BASELINE_UTT_PER_S = 1.0 / 3.659  # reference (BASELINE.md)


def build_latent_engine(max_batch, wire_int16=False, pipeline_depth=2,
                        sampler="pc", sampler_N=30):
    """The PRODUCTION latent serving engine: cli/serve_api.build_engine
    with the flagship latent_diffsep_ouve family config (oobleck_finetune
    VAE + nf=128 latent NCSN++) in bf16 — the exact path `serve_api
    --latent` serves."""
    from ditsep_tpu.cli.common import load_config
    from ditsep_tpu.cli.serve_api import build_engine

    cfg = load_config("latent_diffsep_ouve",
                      ["model.score_model.dtype=bfloat16",
                       "model.vae.dtype=bfloat16"])
    return build_engine(cfg, latent=True, max_batch=max_batch,
                        max_wait_ms=300.0, max_seconds=10.0,
                        sampler_N=sampler_N, sampler=sampler,
                        wire_int16=wire_int16,
                        pipeline_depth=pipeline_depth)


def run_latent(levels, waves, wire_int16=False, pipeline_depth=2,
               sampler="pc", sampler_N=30, mode="waves"):
    """Latent-path sweep through the production engine; returns rows and
    updates docs/serving_bench.json with a `latent_levels` section."""
    rng = np.random.default_rng(0)
    # same utterance-length band as the latent offline bench
    # (docs/latent_bench_r04.json, 8.4 s utts); VAE hop 2048, engine
    # buckets at hop*16=32768 so the band shares one bucket
    lo, hi = 63000, 65536
    rows = []
    for conc in levels:
        eng = build_latent_engine(max(conc, 1), wire_int16,
                                  pipeline_depth, sampler, sampler_N)
        try:
            audios = [rng.standard_normal(
                int(rng.integers(lo, hi + 1))).astype(np.float32) * 0.2
                for _ in range(conc)]
            wait([eng.submit(a) for a in audios], timeout=3600)  # compile
            t0 = time.perf_counter()
            lat = []
            if mode == "saturated":
                # saturated offered load: all waves queued upfront, so
                # >1 batch is in flight and pipeline_depth>=2 overlaps
                # each batch's host<->device transfers with the next
                # batch's compute (wave submit->wait->resubmit keeps
                # exactly one batch in flight and can never overlap)
                futs = [eng.submit(a) for _ in range(waves)
                        for a in audios]
                wait(futs, timeout=3600)
                for f in futs:
                    f.result()
                lat = [time.perf_counter() - t0]
            else:
                for _ in range(waves):
                    futs = [eng.submit(a) for a in audios]
                    t_sub = time.perf_counter()
                    wait(futs, timeout=3600)
                    lat.append(time.perf_counter() - t_sub)
                    for f in futs:
                        f.result()
            dt = time.perf_counter() - t0
            st = eng.stats()
            row = {
                "concurrency": conc,
                "throughput_utt_per_s": round(conc * waves / dt, 4),
                "vs_reference_gpu_waveform": round(
                    (conc * waves / dt) / BASELINE_UTT_PER_S, 3),
                ("makespan_s" if mode == "saturated"
                 else "wave_latency_s_mean"): round(
                    float(np.mean(lat)), 3),
                "mean_batch_occupancy": round(
                    st["mean_batch_occupancy"], 2),
                "batches": st["batches"],
                "pipeline_depth": pipeline_depth,
                "wire": "int16" if wire_int16 else "f32",
                "mode": mode,
                "sampler": sampler,
                "nfe": sampler_N * 2 if sampler == "pc" else sampler_N,
            }
            rows.append(row)
            print(json.dumps(row))
        finally:
            eng.close()
    return rows


def main():
    from ditsep_tpu.models import ScoreModelNCSNpp
    from ditsep_tpu.sdes import MixSDE, pc_sample
    from ditsep_tpu.serving import BatchingEngine

    model = ScoreModelNCSNpp(num_sources=2, nf=128,
                             ch_mult=(1, 1, 2, 2, 2, 2, 2),
                             attn_resolutions=(16,), image_size=256,
                             dtype=jnp.bfloat16)
    sde = MixSDE(N=30)
    key = jax.random.PRNGKey(0)

    # lengths spanning one 64-frame STFT block (~7.6-8.1 s) so mixed
    # requests still share a bucket; block-8 padded length 65153 keeps
    # batch 32 inside v5e HBM (bench.py runs 32 x 67320)
    lo, hi = 61000, 65153
    params = jax.jit(model.init)(key, jnp.zeros((1, 2, hi)),
                                 jnp.full((1,), 0.5),
                                 jnp.zeros((1, 1, hi)))

    @jax.jit
    def sample(params, k, y):
        score_fn = lambda x, t, c: model.apply(params, x, t, c)
        est, _ = pc_sample(sde, score_fn, k, y,
                           predictor="reverse_diffusion", corrector="ald2",
                           N=30, snr=0.5, corrector_steps=1, denoise=True,
                           eps=0.03, n_spkrs=2)
        return est

    levels = [int(x) for x in os.environ.get(
        "SERVE_BENCH_LEVELS", "1,8,32").split(",")]
    waves = int(os.environ.get("SERVE_BENCH_WAVES", "3"))

    if "--latent" in sys.argv:
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", "serving_bench.json")
        with open(path) as f:
            out = json.load(f)
        wire_int16 = os.environ.get("SERVE_BENCH_WIRE") == "int16"
        depth = int(os.environ.get("SERVE_BENCH_DEPTH", "2"))
        mode = os.environ.get("SERVE_BENCH_MODE", "waves")
        sampler = os.environ.get("SERVE_BENCH_SAMPLER", "pc")
        sampler_N = int(os.environ.get("SERVE_BENCH_N", "30"))
        # one key per distinct configuration so sweeps never silently
        # clobber a differently-configured section (rows also carry
        # wire/pipeline_depth/mode/sampler fields as ground truth);
        # canonical short names are kept for the checked-in sweeps
        if sampler == "ab2" and depth > 1 and mode == "saturated":
            # matched-quality fast mode: AB2 at NFE 30 == PC at NFE 60
            # on this pipeline (docs/latent_nfe_r05.json accept rule)
            key = "latent_levels_ab2_fast"
        elif sampler == "ab2":
            key = ("latent_levels_ab2_"
                   + ("int16" if wire_int16 else "f32")
                   + f"_depth{depth}_{mode}")
        elif wire_int16 and depth > 1 and mode == "saturated":
            key = "latent_levels_wire_int16"
        elif not wire_int16 and depth > 1 and mode == "saturated":
            key = "latent_levels_pipelined"
        elif not wire_int16 and depth == 1 and mode == "waves":
            key = "latent_levels"
        else:
            key = ("latent_levels_" + ("int16" if wire_int16 else "f32")
                   + f"_depth{depth}_{mode}")
        out[key] = run_latent(levels, waves, wire_int16=wire_int16,
                              pipeline_depth=depth, sampler=sampler,
                              sampler_N=sampler_N, mode=mode)
        if wire_int16:
            out["wire_int16_note"] = (
                "same production engine with --wire-int16: audio crosses "
                "host<->device as int16 (WAV-16 resolution), halving the "
                "transfer volume the latent_note decomposition showed "
                "dominates wave latency")
        if depth > 1 and mode == "saturated":
            out["pipeline_note"] = (
                "pipeline_depth>=2 (the serve_api default): the engine "
                "dispatch thread uploads+enqueues batch k+1 while batch "
                "k computes and a completion thread blocks on batch k's "
                "host read, so the dominant transfer term overlaps the "
                "next batch's compute; measured under saturated offered "
                "load (all waves queued upfront — submit/wait waves keep "
                "one batch in flight and cannot overlap by construction)")
        out["latent_note"] = (
            "Latent pipeline (encode -> latent PC N=30 'ald' -> decode) "
            "through the PRODUCTION serve_api build_engine (flagship "
            "latent_diffsep_ouve, bf16 score net + bf16 VAE, VAE-hop "
            "buckets). vs_reference_gpu_waveform uses the reference's "
            "WAVEFORM headline for scale only — it ships no latent "
            "runtime artifact. | Gap vs the offline 65.5 utt/s latent "
            "bench decomposed by direct measurement: transferring one "
            "concurrency-32 wave's audio over the remote-TPU tunnel "
            "(8.4 MB requests in + 16.8 MB separated audio out, "
            "trivial-compute probe) costs 1.00 s — the measured 1.11 s "
            "f32-wire wave latency is transfer-bound, not engine- or "
            "compute-bound (the offline bench host-reads only a "
            "scalar). --wire-int16 halves that term; a locally-attached "
            "chip (PCIe) removes it.")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path} (latent_levels)")
        return
    rng = np.random.default_rng(0)
    rows = []
    for conc in levels:
        eng = BatchingEngine(lambda k, y: sample(params, k, y),
                             fs=FS, max_batch=max(conc, 1),
                             max_wait_ms=300.0, max_seconds=10.0)
        try:
            audios = [rng.standard_normal(
                int(rng.integers(lo, hi + 1))).astype(np.float32) * 0.2
                for _ in range(conc)]
            # untimed wave absorbs XLA compilation for this batch shape
            wait([eng.submit(a) for a in audios], timeout=3600)
            t0 = time.perf_counter()
            lat = []
            for _ in range(waves):
                futs = [eng.submit(a) for a in audios]
                t_sub = time.perf_counter()
                wait(futs, timeout=3600)
                lat.append(time.perf_counter() - t_sub)
                for f in futs:
                    f.result()  # surface any errors
            dt = time.perf_counter() - t0
            st = eng.stats()
            row = {
                "concurrency": conc,
                "throughput_utt_per_s": round(conc * waves / dt, 4),
                "vs_reference_gpu": round(
                    (conc * waves / dt) / BASELINE_UTT_PER_S, 3),
                "wave_latency_s_mean": round(float(np.mean(lat)), 3),
                "mean_batch_occupancy": round(
                    st["mean_batch_occupancy"], 2),
                "batches": st["batches"],
            }
            rows.append(row)
            print(json.dumps(row))
        finally:
            eng.close()

    out = {
        "config": {"nf": 128, "N": 30, "dtype": "bf16",
                   "utt_len_samples": [lo, hi], "fs": FS,
                   "waves_per_level": waves,
                   "backend": jax.devices()[0].device_kind},
        "note": ("Throughput at each offered concurrency through the "
                 "serving engine (dynamic batching); concurrency 1 = "
                 "the single-request demo-server regime. Reference GPU "
                 "baseline 0.273 utt/s (BASELINE.md)."),
        "levels": rows,
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs", "serving_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
