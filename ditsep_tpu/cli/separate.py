"""Folder-to-folder separation CLI
(reference: src/inference/separate.py:36-162): read every wav in --input,
run PC sampling, write s0/ s1/ ... subfolders with the separated sources,
scaled by mix projection.
"""
from __future__ import annotations

import argparse
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.cli.common import add_common_args, load_config
from ditsep_tpu.configs import build_diffsep_trainer
from ditsep_tpu.data import read_wav, write_wav


def scale_output(mix: np.ndarray, est: np.ndarray) -> np.ndarray:
    """Project the mixture onto each estimate for output scaling
    (reference: src/inference/separate.py:73-78)."""
    num = (est * mix).sum(axis=-1, keepdims=True)
    den = np.maximum((est * est).sum(axis=-1, keepdims=True), 1e-10)
    return est * num / den


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--input", required=True, help="folder of wav files")
    p.add_argument("--output", required=True, help="output folder")
    p.add_argument("--params", default=None, help="npz score-model params")
    p.add_argument("--sampler-N", type=int, default=30)
    p.add_argument("--sampler", choices=("pc", "ab2"), default="pc",
                   help="'ab2' = 2nd-order multistep, one score eval "
                        "per step (see docs/nfe_study.json)")
    p.add_argument("--mask-padding", action="store_true",
                   help="padding-robust scoring: mask the %%64 frame pad "
                        "out of normalization/attention statistics — "
                        "avoids the quality dip at unlucky file lengths "
                        "(docs/pad_dilution_r03.md); works with "
                        "unmasked-trained checkpoints")
    p.add_argument("--chunk-seconds", type=float, default=None,
                   help="long-form mode: separate in fixed windows of "
                        "this many seconds (one static shape -> one XLA "
                        "compile for any file length), permutation-align "
                        "adjacent windows and crossfade-stitch "
                        "(inference/longform.py)")
    p.add_argument("--overlap-seconds", type=float, default=1.0,
                   help="window overlap for --chunk-seconds "
                        "(alignment + crossfade region)")
    p.add_argument("--streaming-block-seconds", type=float, default=None,
                   help="with --chunk-seconds: feed each file through "
                        "the bounded-latency StreamingSeparator in "
                        "blocks of this many seconds (exercises the "
                        "real-time path, serving/streaming.py) instead "
                        "of the offline stitcher")
    args = p.parse_args(argv)
    if args.streaming_block_seconds and not args.chunk_seconds:
        p.error("--streaming-block-seconds requires --chunk-seconds "
                "(the streaming path is windowed)")
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)
    if args.mask_padding:
        cfg["model"]["score_model"]["mask_padding"] = True

    trainer = build_diffsep_trainer(cfg)
    n_src = trainer.cfg.n_speakers
    fs = cfg["datamodule"].get("fs", 8000)

    files = sorted(f for f in os.listdir(args.input) if f.endswith(".wav"))
    if not files:
        raise SystemExit(f"no wav files in {args.input}")
    key = jax.random.PRNGKey(args.seed)

    # params are length-agnostic; init on the first file's shape class
    mix0, _ = read_wav(os.path.join(args.input, files[0]))
    from ditsep_tpu.cli.common import init_or_load_score_params
    params = init_or_load_score_params(trainer, n_src,
                                       int(np.asarray(mix0).shape[-1]),
                                       args.params, seed=args.seed)

    for i in range(n_src):
        Path(args.output, f"s{i}").mkdir(parents=True, exist_ok=True)

    sep_p = jax.jit(lambda p, k, mix: trainer.separate(
        p, k, mix, N=args.sampler_N, sampler=args.sampler)[0])
    sep = lambda k, mix: sep_p(params, k, mix)
    if args.mask_padding:
        # lengths-aware variant for chunked mode: a file shorter than the
        # window is host-zero-padded, and those samples must be masked
        # out of the score statistics like any other padding
        sep_len_p = jax.jit(lambda p, k, mix, lens: trainer.separate(
            p, k, mix, N=args.sampler_N, sampler=args.sampler,
            lengths=lens)[0])
        sep_chunk = lambda k, mix, lens: sep_len_p(params, k, mix, lens)
    else:
        sep_chunk = sep
    for f in files:
        mix, in_fs = read_wav(os.path.join(args.input, f))
        mix = np.atleast_2d(mix).reshape(1, 1, -1).astype(np.float32)
        key, sub = jax.random.split(key)
        if args.chunk_seconds and args.streaming_block_seconds:
            from ditsep_tpu.serving import StreamingSeparator
            stream = StreamingSeparator(
                sep_chunk,
                chunk_samples=int(args.chunk_seconds * fs),
                overlap_samples=int(args.overlap_seconds * fs),
                n_src=n_src, key=sub,
                pass_lengths=args.mask_padding)
            block = max(1, int(args.streaming_block_seconds * fs))
            flat = mix.reshape(-1)
            pieces = [stream.push(flat[s:s + block])
                      for s in range(0, flat.shape[-1], block)]
            pieces.append(stream.flush())
            est = np.concatenate(pieces, axis=-1)
        elif args.chunk_seconds:
            from ditsep_tpu.inference import separate_longform
            est = separate_longform(
                sep_chunk, mix.reshape(-1),
                chunk_samples=int(args.chunk_seconds * fs),
                overlap_samples=int(args.overlap_seconds * fs),
                n_src=n_src, key=sub,
                pass_lengths=args.mask_padding)
        else:
            est = np.asarray(sep(sub, jnp.asarray(mix)))[0]
        est = scale_output(mix[0], est)
        for i in range(n_src):
            write_wav(str(Path(args.output, f"s{i}", f)), est[i], fs)
    print(f"separated {len(files)} files into {args.output}/s0..s{n_src-1}")


if __name__ == "__main__":
    main()
