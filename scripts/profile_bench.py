"""Profile the PC-sampling hot path by parts on the real TPU.

VERDICT round 1 asked for a measured breakdown instead of guesses: where
do the 8.25 s/batch of the 30-step sampler go?  This script times, on the
attached TPU chip (same shapes as bench.py):

  1. the full 30-step PC sampler             (the headline)
  2. one score-net call (fwd only)           (sampler = 60 of these + eps)
  3. NCSN++ alone on pre-built spectrograms  (isolates the STFT frontend)
  4. STFT + transform + iSTFT alone
  5. NCSN++ depth ablation (ch_mult prefixes) -> per-level cost
  6. attention on/off at resolution 16
  7. f32 vs bf16 compute
  8. frame padding waste: %64-padded frames vs a hypothetical %16 model

Writes docs/profile_r02.md with the numbers + derived FLOP utilisation.
Run: python scripts/profile_bench.py   (TPU; JAX_PLATFORMS=cpu to smoke)
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
BATCH = int(os.environ.get("BENCH_BATCH", "16"))
REPS = int(os.environ.get("BENCH_REPS", "3"))


def timed(fn, *args):
    """Median wall-clock of fn(*args) with a host-read sync."""
    out = fn(*args)
    float(np.asarray(jnp.mean(jax.tree.leaves(out)[0].astype(
        jnp.float32))))  # sync incl. host read (axon quirk, bench.py:71)
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jnp.mean(jax.tree.leaves(out)[0].astype(
            jnp.float32))))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def build_model(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), attn=(16,),
                dtype=jnp.bfloat16):
    from ditsep_tpu.models import ScoreModelNCSNpp
    return ScoreModelNCSNpp(num_sources=2, nf=nf, ch_mult=tuple(ch_mult),
                            attn_resolutions=tuple(attn), image_size=256,
                            dtype=dtype)


def main():
    from ditsep_tpu.sdes import MixSDE, pc_sample

    key = jax.random.PRNGKey(0)
    t_len = int(UTT_SECONDS * FS)
    mix = jax.random.normal(key, (BATCH, 1, t_len))
    xt = jax.random.normal(key, (BATCH, 2, t_len))
    tc = jnp.full((BATCH,), 0.5)
    results = {}

    dev = jax.devices()[0]
    results["device"] = str(dev)

    # ---- 1. full sampler + 2. one score call, bf16 and f32 -------------
    # f32 at the full batch exceeds the v5e's 16 GB HBM (the profile run
    # showed a 43 GB allocation); compare f32 on the score call at a
    # reduced batch instead.
    for tag, dtype in [("bf16", jnp.bfloat16), ("f32", None)]:
        model = build_model(dtype=dtype)
        sde = MixSDE(N=30)

        @jax.jit
        def score_once(p, x, t, y):
            return model.apply(p, x, t, y)

        if tag == "f32":
            b4 = 4
            params4 = jax.jit(model.init)(key, xt[:b4], tc[:b4], mix[:b4])
            results["score_call_f32_b4_s"] = timed(
                score_once, params4, xt[:b4], tc[:b4], mix[:b4])
            continue

        params = jax.jit(model.init)(key, xt, tc, mix)

        @jax.jit
        def sample(p, k, y):
            return pc_sample(sde, lambda x, t, c: model.apply(p, x, t, c),
                             k, y, predictor="reverse_diffusion",
                             corrector="ald2", N=30, snr=0.5,
                             corrector_steps=1, denoise=True, eps=0.03,
                             n_spkrs=2)[0]

        results[f"sampler_{tag}_s"] = timed(
            sample, params, jax.random.PRNGKey(1), mix)
        results[f"score_call_{tag}_s"] = timed(
            score_once, params, xt, tc, mix)
        results["score_call_bf16_b4_s"] = timed(
            score_once,
            jax.jit(model.init)(key, xt[:4], tc[:4], mix[:4]),
            xt[:4], tc[:4], mix[:4])

        # ---- 3./4. STFT frontend vs NCSN++ body (bf16 model) ----------
        @jax.jit
        def frontend_only(x):
            h, n, npad = model.pre_process(x)
            return model.post_process(h, n, npad)

        cat = jnp.concatenate([xt, mix], axis=1)
        results["stft_roundtrip_s"] = timed(frontend_only, cat)

        h0, _, _ = jax.jit(model.pre_process)(cat)
        h0 = jax.block_until_ready(h0)
        from ditsep_tpu.models import NCSNpp
        body = NCSNpp(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                      num_res_blocks=2, attn_resolutions=(16,),
                      image_size=256, num_channels_in=6,
                      num_channels_out=4, dtype=jnp.bfloat16)
        bparams = jax.jit(body.init)(key, h0, tc)

        @jax.jit
        def body_only(p, h, t):
            return body.apply(p, h, t)

        results["ncsnpp_body_s"] = timed(body_only, bparams, h0, tc)

        # ---- 6. attention ablation ------------------------------------
        body_na = NCSNpp(nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2),
                         num_res_blocks=2, attn_resolutions=(),
                         image_size=256, num_channels_in=6,
                         num_channels_out=4, dtype=jnp.bfloat16)
        pna = jax.jit(body_na.init)(key, h0, tc)
        results["ncsnpp_noattn_s"] = timed(
            jax.jit(lambda p, h, t: body_na.apply(p, h, t)), pna, h0, tc)

        # ---- 5. depth ablation: cumulative ch_mult prefixes -----------
        for levels in (2, 4, 6):
            cm = (1, 1, 2, 2, 2, 2, 2)[:levels]
            mb = NCSNpp(nf=128, ch_mult=cm, num_res_blocks=2,
                        attn_resolutions=(), image_size=256,
                        num_channels_in=6, num_channels_out=4,
                        dtype=jnp.bfloat16)
            pb = jax.jit(mb.init)(key, h0, tc)
            results[f"ncsnpp_levels{levels}_s"] = timed(
                jax.jit(lambda p, h, t, m=mb: m.apply(p, h, t)),
                pb, h0, tc)

        # ---- 8. padding waste: actual frames vs %64 pad ----------------
        frames = h0.shape[2]
        results["frames_padded"] = int(frames)
        spec = jax.jit(model.pre_process)(cat)[0]
        # true frame count before %64 rounding
        pad_samples = model.n_fft - model.hop_length
        n_frames_true = (t_len + pad_samples - model.n_fft) \
            // model.hop_length + 1
        results["frames_true"] = int(n_frames_true)
        results["frame_pad_waste_pct"] = round(
            100.0 * (frames - n_frames_true) / frames, 2)

    # FLOP estimate for one score call (dominant 3x3 convs, bf16)
    # level dims (F x T x C): full-res convs dominate; report utilisation
    # against the sampler number: NFE=60 score calls per utterance batch.
    results["batch"] = BATCH
    results["utt_per_s_sampler_bf16"] = round(
        BATCH / results["sampler_bf16_s"], 3)
    print(json.dumps(results, indent=1))

    os.makedirs("docs", exist_ok=True)
    with open("docs/profile_r02.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
