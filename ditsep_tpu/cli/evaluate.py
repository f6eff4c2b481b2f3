"""Test-set evaluation entry: batched, bucketed, mesh-sharded PC sampling
(reference: src/evaluate_mp.py:398-529 -- replaces the whole
torch.multiprocessing pool with one jitted sharded sampler).

    python -m ditsep_tpu.cli.evaluate --config diffsep \
        --params runs/exp/best.npz --data-path /data/librimix \
        --out-dir results/exp
"""
from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from ditsep_tpu.cli.common import add_common_args, load_config, make_dataset
from ditsep_tpu.configs import build_diffsep_trainer
from ditsep_tpu.eval import evaluate_dataset


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--params", default=None, help="npz score-model params")
    p.add_argument("--out-dir", default=None)
    p.add_argument("--split", default="test")
    p.add_argument("--sampler-N", type=int, default=30)
    p.add_argument("--sampler", choices=("pc", "ab2"), default="pc",
                   help="'ab2' = 2nd-order multistep, one score eval "
                        "per step (see docs/nfe_study.json before "
                        "trading NFE for quality)")
    p.add_argument("--snr", type=float, default=0.5)
    p.add_argument("--corrector-steps", type=int, default=1)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--eval-batch-size", type=int, default=4)
    p.add_argument("--bucket-multiple", type=int, default=4096,
                   help="sample-domain bucket granularity — used only by "
                        "the --latent and --no-proc paths; the waveform "
                        "path buckets by the model's 64-frame STFT "
                        "blocks instead (quality-critical, see "
                        "docs/pad_dilution_r03.md) and ignores this")
    p.add_argument("--max-buckets", type=int, default=24,
                   help="cap on distinct padded length shapes (each costs "
                        "one XLA compile); sparse buckets consolidate. "
                        "Buckets follow the score model's 64-frame STFT "
                        "blocks; merging past the cap pads some "
                        "utterances beyond their native frame block, "
                        "which measurably costs quality (see "
                        "docs/pad_dilution_r03.md) — keep this at or "
                        "above the block count for parity evals")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip the untimed warmup call per bucket shape "
                        "(compile time then lands in 'runtime')")
    p.add_argument("--save-samples", type=int, default=0,
                   help="dump enh{i}.wav for the first N utterances "
                        "(reference: evaluate_mp.py save_samples)")
    p.add_argument("--save-figures", type=int, default=0,
                   help="save spectrogram PDFs for the first N utterances")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 score-net compute (validated 47-80 dB "
                        "SI-SDR agreement vs f32 through the sampler)")
    p.add_argument("--mask-padding", action="store_true",
                   help="padding-robust scoring (extension beyond the "
                        "reference): mask each utterance's trailing "
                        "quiet frames out of GroupNorm/attention "
                        "statistics, removing the %%64 frame-pad "
                        "quality dilution at any bucket size "
                        "(docs/pad_dilution_r03.md). Works with "
                        "unmasked-trained checkpoints")
    p.add_argument("--no-proc", action="store_true",
                   help="mixture baseline: score the raw mix, no model "
                        "(reference ckpt sentinel __no_proc__)")
    p.add_argument("--latent", action="store_true",
                   help="evaluate the latent pipeline (evaluate_latent "
                        "equivalent; reference: src/evaluate_latent.py)")
    p.add_argument("--vae-params", default=None)
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)
    if args.bf16:
        cfg["model"]["score_model"]["dtype"] = "bfloat16"
    if args.mask_padding:
        cfg["model"]["score_model"]["mask_padding"] = True

    ds = make_dataset(cfg, "test", args.data_path, args.synthetic,
                      synthetic_items=args.synthetic_items,
                      synthetic_len_s=args.synthetic_len_s)
    key = jax.random.PRNGKey(args.seed)
    mix0, tgt0 = ds[0]

    if args.no_proc:
        # mixture baseline: score the unprocessed mix broadcast to the
        # source count, nfe 0 (reference: evaluate_mp.py:223,303-308
        # ckpt == "__no_proc__")
        n_spkr = tgt0.shape[0]
        sep = lambda k, mix: jnp.broadcast_to(
            mix, (mix.shape[0], n_spkr, mix.shape[-1]))
        res = evaluate_dataset(
            sep, ds, fs=cfg["datamodule"].get("fs", 8000),
            batch_size=args.eval_batch_size, nfe=0,
            bucket_multiple=args.bucket_multiple, frame_spec=None,
            max_buckets=args.max_buckets, out_dir=args.out_dir,
            split_name=cfg["datamodule"]["test"]["split"],
            limit=args.limit, seed=args.seed, warmup=False)
        print(json.dumps(res["summary"], indent=2))
        return

    if args.latent:
        if args.sampler != "pc":
            raise SystemExit(
                "--sampler ab2 is not wired for the latent path "
                "(separate_latent follows the reference 'ald' PC config)")
        from ditsep_tpu.cli.train_diffsep_latent import init_vae_params
        from ditsep_tpu.configs import build_latent_trainer
        trainer = build_latent_trainer(cfg)
        vae_params = init_vae_params(trainer, args.vae_params, key)
        mix_lat, tgt_lat = trainer.encode(
            vae_params, None, jnp.asarray(mix0[None]),
            jnp.asarray(tgt0[None]))
        template = trainer.model.init(key, tgt_lat, jnp.full((1,), 0.5),
                                      mix_lat)
    else:
        trainer = build_diffsep_trainer(cfg)
        template = trainer.model.init(key, jnp.asarray(tgt0[None]),
                                      jnp.full((1,), 0.5),
                                      jnp.asarray(mix0[None]))
    if args.params:
        from ditsep_tpu.utils.checkpoint import load_params_npz
        params = {"params": load_params_npz(args.params,
                                            template["params"])}
    else:
        params = template  # random weights: pipeline check only

    mesh = None
    if args.mesh:
        from ditsep_tpu.parallel import make_mesh
        mesh = make_mesh()

    # params as jit arguments (closures embed them as program constants,
    # which breaks/slows the remote-compile tunnel)
    if args.latent:
        sep_p = jax.jit(lambda p, vp, k, mix: trainer.separate_latent(
            p, vp, k, mix, target_dim=mix.shape[-1],
            N=args.sampler_N)[0])
        sep = lambda k, mix: sep_p(params, vae_params, k, mix)
    elif args.mask_padding:
        sep_p = jax.jit(lambda p, k, mix, lens: trainer.separate(
            p, k, mix, N=args.sampler_N, snr=args.snr,
            corrector_steps=args.corrector_steps,
            sampler=args.sampler, lengths=lens)[0])
        sep = lambda k, mix, lens: sep_p(params, k, mix, lens)
    else:
        sep_p = jax.jit(lambda p, k, mix: trainer.separate(
            p, k, mix, N=args.sampler_N, snr=args.snr,
            corrector_steps=args.corrector_steps,
            sampler=args.sampler)[0])
        sep = lambda k, mix: sep_p(params, k, mix)
    nfe = (args.sampler_N if args.sampler == "ab2"
           else args.sampler_N * (args.corrector_steps + 1))
    sm = cfg["model"]["score_model"]
    # waveform path: bucket by the score model's own STFT frame blocks
    # (quality parity with native-length eval — see eval/evaluate.py);
    # latent path: the latent score net pads T_lat to a tiny multiple
    # (max_latent_length=4), so dilution is negligible and sample-domain
    # buckets are fine.
    frame_spec = (None if args.latent
                  else (sm.get("n_fft", 510), sm.get("hop_length", 128), 64))
    res = evaluate_dataset(
        sep, ds, fs=cfg["datamodule"].get("fs", 8000),
        batch_size=args.eval_batch_size, nfe=nfe, mesh=mesh,
        bucket_multiple=args.bucket_multiple, frame_spec=frame_spec,
        max_buckets=args.max_buckets,
        out_dir=args.out_dir,
        split_name=cfg["datamodule"]["test"]["split"], limit=args.limit,
        seed=args.seed, save_samples=args.save_samples,
        save_figures=args.save_figures, warmup=not args.no_warmup,
        pass_lengths=args.mask_padding and not args.latent)
    print(json.dumps(res["summary"], indent=2))


if __name__ == "__main__":
    main()
