"""Close the train -> checkpoint -> eval learning loop for the LATENT
pipeline on synthetic data (the latent analogue of round 3's waveform
long-train, docs/long_train_r03.json).

Two phases, both on the attached TPU, both driven through the real
training code paths:

1. VAE: AutoencoderTrainer (reconstruction: perceptual MRSTFT + L1 + KL,
   no discriminator — SI-SDR is the gate here, adversarial terms buy
   realism, not fidelity) on mono views of the synthetic mixtures
   (sources AND mixes, so the encoder sees both distributions).
   Reference counterpart: stable_audio_tools AutoencoderTrainingWrapper
   (src/stable_audio_tools/training/autoencoders.py:365-530), which
   trains the oobleck VAE the latent pipeline rides.
2. Latent score: the latent_diffsep_ouve config family shrunk to a
   64x-compression VAE (synthetic harmonic-tone mixtures carry far less
   structure than speech; 2048x would gate the ceiling on VAE capacity,
   not on the score model), trained with
   LatentDiffSepTrainer.train_step_latent (frozen VAE, reference:
   src/diffsep_latent.py:210-287), evaluated at interims end-to-end:
   encode -> 30-step latent PC ('ald') -> decode vs the mixture
   baseline, with the VAE reconstruction SI-SDR as the measured ceiling.

Writes docs/latent_long_train_r05.json progressively (crash-safe) and
the trained params (vae.npz / score_ema.npz) under --workdir.

    python scripts/latent_long_train.py [--vae-steps N] [--score-steps N]
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", str(ROOT / ".jax_cache")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)

FS = 8000
LEN_S = 4.0
T_LEN = int(LEN_S * FS)

# 64x-compression VAE + small latent score model (see module docstring)
OVERRIDES = {
    "model.vae.channels": 32,
    "model.vae.latent_dim": 16,
    "model.vae.c_mults": (1, 2, 4),
    "model.vae.strides": (2, 4, 8),
    # nf=64: every up-path skip-concat channel count stays divisible by
    # the 32 GroupNorm groups (nf=48 yields 144-channel concats, which
    # the reference's torch GroupNorm would reject identically)
    "model.score_model.nf": 64,
    "model.score_model.ch_mult": (1, 2),
    "model.score_model.attn_resolutions": (8,),
    "model.score_model.image_size": 16,
}


def make_batcher(n_items: int, seed: int):
    """Host batcher over SyntheticTonalMixDataset (fixed 4 s items ->
    static shapes). Harmonic tones, NOT round 3's band-split noise:
    noise waveforms carry more dof/s than a 64x-compressed latent rate,
    so no codec can reconstruct them and the VAE recon ceiling (hence
    the whole artifact) would sit at noise level by construction —
    measured: -49 dB recon SI-SDR, flat, on the band-split task. Tones
    are the minimal codec-compressible stand-in for speech, with the
    same disjoint-band separability (see the dataset docstring)."""
    from ditsep_tpu.data.wsj0_mix import SyntheticTonalMixDataset

    ds = SyntheticTonalMixDataset(n_items=n_items, min_len_s=LEN_S,
                                  max_len_s=LEN_S, seed=seed)
    cache = {}

    def get(i):
        if i not in cache:
            cache[i] = ds[i]
        return cache[i]

    def batch(rng, b):
        idx = rng.integers(0, n_items, size=b)
        mixes, tgts = zip(*(get(int(i)) for i in idx))
        return (jnp.asarray(np.stack(mixes)), jnp.asarray(np.stack(tgts)))

    return batch


def si_sdr_pit_mean(est: np.ndarray, tgt: np.ndarray) -> float:
    """Batch-mean PIT SI-SDR through the eval metric stack (the same
    contract cli/evaluate scores with; zero_mean=False like the latent
    val path)."""
    from ditsep_tpu.eval.metrics import si_bss_eval_sources

    vals = []
    for b in range(est.shape[0]):
        sdr, _, _, _ = si_bss_eval_sources(tgt[b], est[b])
        vals.append(float(np.mean(sdr)))
    return float(np.mean(vals))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="/tmp/latent_long_train_r05")
    p.add_argument("--out", default=str(ROOT / "docs"
                                        / "latent_long_train_r05.json"))
    p.add_argument("--vae-steps", type=int, default=8000)
    p.add_argument("--score-steps", type=int, default=20000)
    p.add_argument("--interim-every", type=int, default=4000)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--vae-batch", type=int, default=8)
    p.add_argument("--n-train", type=int, default=2048)
    p.add_argument("--eval-n", type=int, default=30)
    p.add_argument("--val-batch", type=int, default=16)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ditsep_tpu.configs import latent_diffsep_ouve, override
    from ditsep_tpu.configs.build import build_latent_trainer, \
        build_oobleck_vae
    from ditsep_tpu.training.autoencoder import (AutoencoderLossConfig,
                                                 AutoencoderTrainer)
    from ditsep_tpu.utils.checkpoint import save_params_npz

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    cfg = override(latent_diffsep_ouve(), OVERRIDES)
    trainer = build_latent_trainer(cfg)
    vae = trainer.vae
    hop = vae.downsampling_ratio

    artifact = {
        "config": {
            "family": "latent_diffsep_ouve (shrunk)",
            "overrides": {k: list(v) if isinstance(v, tuple) else v
                          for k, v in OVERRIDES.items()},
            "compression": hop, "fs": FS, "len_s": LEN_S,
            "vae_steps": args.vae_steps, "score_steps": args.score_steps,
            "batch": args.batch, "n_train": args.n_train,
            "eval_N": args.eval_n,
            "backend": str(jax.devices()[0]),
        },
        "phase1_vae": {"interims": []},
        "phase2_score": {"interims": []},
    }

    def flush():
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)

    train_batch = make_batcher(args.n_train, seed=0)
    val_batch_fn = make_batcher(256, seed=10_000)  # disjoint val stream
    rng = np.random.default_rng(0)
    val_mix, val_tgt = val_batch_fn(np.random.default_rng(99),
                                    args.val_batch)
    val_tgt_np = np.asarray(val_tgt)
    mix_base = si_sdr_pit_mean(
        np.repeat(np.asarray(val_mix), 2, axis=1), val_tgt_np)
    artifact["mixture_baseline_si_sdr"] = round(mix_base, 3)
    flush()

    # ---------------------------------------------------- phase 1: VAE --
    # Loss weights tuned for TONAL data (vs the reference speech config):
    # A-weighting OFF — at 8 kHz it attenuates a 120 Hz fundamental by
    # ~29 dB, hiding source 0 from the loss entirely; L1 at 1.0 — tonal
    # spectra are sparse (most STFT bins empty), which makes silence a
    # strong MRSTFT local minimum (measured: decoder pinned at exactly
    # -79.18 dB recon for 4k steps with the speech weights); the
    # time-domain term provides the escape gradient.
    ae = AutoencoderTrainer(
        vae=vae,
        loss_cfg=AutoencoderLossConfig(
            l1=1.0, perceptual_weighting=False,
            fft_sizes=(1024, 512, 256, 128, 64),
            hop_sizes=(256, 128, 64, 32, 16), sample_rate=FS),
        lr=2e-4, clip_grad_norm=1.0)
    key = jax.random.PRNGKey(0)
    vae_params = jax.jit(vae.init)(key, jnp.zeros((1, 1, T_LEN)))
    ae_state = ae.init_state(vae_params)
    gen_step = jax.jit(lambda s, k, r: ae.gen_step(s, k, r,
                                                   warmed_up=False))

    def mono_reals(b):
        """Random mono views: each row a source or the mix."""
        mix, tgt = train_batch(rng, b)
        pick = rng.integers(0, 3, size=b)  # 0/1 = source, 2 = mix
        rows = [tgt[i, pick[i]] if pick[i] < 2 else mix[i, 0]
                for i in range(b)]
        return jnp.stack(rows)[:, None, :]

    def vae_recon_sdr(params):
        """Reconstruction SI-SDR of the val SOURCES — the separation
        ceiling this VAE imposes."""
        flat = val_tgt.reshape(-1, 1, val_tgt.shape[-1])
        lat = vae.apply(params, jnp.pad(
            flat, ((0, 0), (0, 0), (0, (-flat.shape[-1]) % hop))),
            method=vae.encode)  # mode (no key): deterministic recon
        dec = vae.apply(params, lat, method=vae.decode)
        dec = np.asarray(dec)[..., :val_tgt.shape[-1]]
        dec = dec.reshape(val_tgt_np.shape)
        return si_sdr_pit_mean(dec, val_tgt_np)

    t0 = time.time()
    for step in range(1, args.vae_steps + 1):
        key, k = jax.random.split(key)
        ae_state, m = gen_step(ae_state, k, mono_reals(args.vae_batch))
        if step % max(1, args.interim_every // 5) == 0 \
                or step == args.vae_steps:
            loss = float(m["train/loss"])
            sdr_live = vae_recon_sdr(ae_state.vae_params)
            sdr_ema = vae_recon_sdr(ae_state.ema_vae_params)
            dt = time.time() - t0
            entry = {"step": step, "loss": round(loss, 4),
                     "recon_si_sdr": round(sdr_live, 3),
                     "recon_si_sdr_ema": round(sdr_ema, 3),
                     "steps_per_s": round(step / dt, 3)}
            artifact["phase1_vae"]["interims"].append(entry)
            flush()
            # crash-safe: keep the better-of-live/EMA weights on disk so
            # downstream consumers (latent_nfe_study) survive a kill
            save_params_npz(str(work / "vae.npz"),
                            ae_state.ema_vae_params
                            if sdr_ema >= sdr_live else ae_state.vae_params)
            print(f"[vae {step}] loss={loss:.4f} recon={sdr_live:.2f} "
                  f"ema={sdr_ema:.2f} dB ({step / dt:.2f} st/s)",
                  flush=True)
    # carry the better weights into phase 2 (0.9999-decay EMA may not
    # have converged over a short phase 1)
    last = artifact["phase1_vae"]["interims"][-1]
    if last["recon_si_sdr_ema"] >= last["recon_si_sdr"]:
        vae_params, ceiling = ae_state.ema_vae_params, \
            last["recon_si_sdr_ema"]
        artifact["phase1_vae"]["selected"] = "ema"
    else:
        vae_params, ceiling = ae_state.vae_params, last["recon_si_sdr"]
        artifact["phase1_vae"]["selected"] = "live"
    save_params_npz(str(work / "vae.npz"), vae_params)
    artifact["phase1_vae"]["recon_ceiling_si_sdr"] = ceiling
    flush()

    # -------------------------------------------- phase 2: latent score --
    key = jax.random.PRNGKey(1)
    mix, tgt = train_batch(rng, args.batch)
    mix_lat, tgt_lat = trainer.encode(vae_params, None, mix, tgt)
    params = jax.jit(trainer.model.init)(
        key, tgt_lat, jnp.full((args.batch,), 0.5), mix_lat)
    state = trainer.init_state(params)
    step_fn = jax.jit(lambda s, vp, k, b: trainer.train_step_latent(
        s, vp, k, b))
    sep_fn = jax.jit(lambda p, vp, k, m: trainer.separate_latent(
        p, vp, k, m, target_dim=T_LEN, N=args.eval_n)[0])

    def eval_sep(score_params):
        est = np.asarray(sep_fn(score_params, vae_params,
                                jax.random.PRNGKey(7), val_mix))
        return si_sdr_pit_mean(est, val_tgt_np)

    t0 = time.time()
    for step in range(1, args.score_steps + 1):
        key, k = jax.random.split(key)
        state, m = step_fn(state, vae_params, k, train_batch(rng,
                                                             args.batch))
        if step % args.interim_every == 0 or step == args.score_steps:
            loss = float(m["train/score_loss"])
            sdr = eval_sep(state.params)
            sdr_ema = eval_sep(state.ema_params)
            dt = time.time() - t0
            entry = {"step": step, "score_loss": round(loss, 4),
                     "si_sdr_separated": round(sdr, 3),
                     "si_sdr_separated_ema": round(sdr_ema, 3),
                     "improvement_db": round(sdr_ema - mix_base, 3),
                     "steps_per_s": round(step / dt, 3)}
            artifact["phase2_score"]["interims"].append(entry)
            flush()
            save_params_npz(str(work / "score_ema.npz"), state.ema_params)
            print(f"[score {step}] loss={loss:.4f} sep={sdr:.2f} "
                  f"ema={sdr_ema:.2f} dB ({step / dt:.2f} st/s)",
                  flush=True)
    save_params_npz(str(work / "score_ema.npz"), state.ema_params)
    last = artifact["phase2_score"]["interims"][-1]
    artifact["summary"] = {
        "mixture_baseline_si_sdr": artifact["mixture_baseline_si_sdr"],
        "vae_recon_ceiling_si_sdr":
            artifact["phase1_vae"]["recon_ceiling_si_sdr"],
        "separated_si_sdr_ema": last["si_sdr_separated_ema"],
        "improvement_db": last["improvement_db"],
        "note": ("end-to-end latent pipeline learns on synthetic "
                 "harmonic-tone mixtures: VAE trained from scratch "
                 "(AutoencoderTrainer), latent score trained inside it "
                 "(train_step_latent), evaluated encode -> latent "
                 f"PC(N={args.eval_n}) -> decode vs mixture baseline; "
                 "the VAE reconstruction SI-SDR is the measured ceiling"),
    }
    flush()
    print(json.dumps(artifact["summary"]))


if __name__ == "__main__":
    main()
