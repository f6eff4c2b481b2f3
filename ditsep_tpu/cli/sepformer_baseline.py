"""SepFormer baseline separation for comparison runs.

Counterpart of the reference's SpeechBrain baseline script
(reference: scripts/sepformer.py:1-20): separate a folder of mixtures
with a SepFormer model and write s0/ s1/ outputs in the same layout as
ditsep_tpu.cli.separate, so the two systems' outputs diff directly.

Two backends:

* ``--backend native`` (default): the TPU-native
  :class:`ditsep_tpu.models.SepFormer` — one jitted program per padded
  length bucket, pretrained weights imported from a SpeechBrain
  checkpoint via :func:`sepformer_params_from_torch`. ``--ckpt`` points
  at either one merged torch state file or a directory holding
  SpeechBrain's ``encoder.ckpt`` / ``masknet.ckpt`` / ``decoder.ckpt``
  (the layout ``Sepformer.from_hparams`` downloads into its savedir);
  omitted, random init (smoke/demo only).
* ``--backend speechbrain``: shell out to the pretrained torch model,
  exactly like the reference script. Gated on the optional
  `speechbrain` package.

    python -m ditsep_tpu.cli.sepformer_baseline \
        --input mixtures/ --output baseline_out/ --ckpt sepformer_ckpt/
"""
from __future__ import annotations

import argparse
import os


def _load_native_state(path: str):
    """Merge SpeechBrain's per-module checkpoint files (or pass through
    a single already-merged state dict) into one flat dict with
    encoder./masknet./decoder. prefixes."""
    import torch

    if os.path.isdir(path):
        state = {}
        for mod in ("encoder", "masknet", "decoder"):
            f = os.path.join(path, f"{mod}.ckpt")
            if not os.path.exists(f):
                raise SystemExit(
                    f"--ckpt dir {path} is missing {mod}.ckpt (expected "
                    "the SpeechBrain savedir layout)")
            sd = torch.load(f, map_location="cpu", weights_only=True)
            state.update({f"{mod}.{k}": v for k, v in sd.items()})
        return state
    obj = torch.load(path, map_location="cpu", weights_only=True)
    return obj.get("state_dict", obj) if isinstance(obj, dict) else obj


def _run_native(args, wavs):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ditsep_tpu.data.wsj0_mix import read_wav, write_wav
    from ditsep_tpu.models.sepformer import (
        SepFormer, sepformer_params_from_torch)

    import json

    kwargs = json.loads(args.model_kwargs) if args.model_kwargs else {}
    kwargs.setdefault("num_spks", args.num_spks)
    model = SepFormer(**kwargs)
    if args.ckpt:
        params = sepformer_params_from_torch(
            _load_native_state(args.ckpt), model)
    else:
        print("[sepformer_baseline] no --ckpt: RANDOM weights (smoke run)")
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, args.bucket), jnp.float32))
    fwd = jax.jit(lambda m: model.apply(params, m))

    n = 0
    for name in wavs:
        x, fs = read_wav(os.path.join(args.input, name))
        if fs != args.fs:
            print(f"[sepformer_baseline] {name}: {fs} Hz != --fs "
                  f"{args.fs}, skipping")
            continue
        T = x.shape[-1]
        # pad to a bucket multiple: bounded distinct shapes -> bounded
        # XLA compiles over a whole folder
        pad = (-T) % args.bucket
        mix = jnp.asarray(np.pad(x.astype(np.float32), (0, pad))[None])
        est = np.asarray(fwd(mix))[0, :, :T]  # (spks, T)
        # match SepformerSeparation.separate_file's per-source peak
        # normalization of the written files
        est = est / np.maximum(np.abs(est).max(axis=-1, keepdims=True),
                               1e-8)
        for s in range(est.shape[0]):
            out_dir = os.path.join(args.output, f"s{s}")
            os.makedirs(out_dir, exist_ok=True)
            write_wav(os.path.join(out_dir, name), est[s], args.fs)
        n += 1
    print(f"separated {n} files -> {args.output}/s*/ (native)")


def _run_speechbrain(args, wavs):
    try:
        from speechbrain.inference.separation import (
            SepformerSeparation as Sepformer)
    except ImportError as e:
        raise SystemExit(
            "speechbrain is not installed in this image; use --backend "
            "native, or install speechbrain in a baseline-eval "
            "environment (reference: scripts/sepformer.py)") from e

    import numpy as np

    from ditsep_tpu.data.wsj0_mix import write_wav

    model = Sepformer.from_hparams(source=args.model,
                                   savedir=args.savedir)
    for name in wavs:
        est = model.separate_file(path=os.path.join(args.input, name))
        est = est.detach().cpu().numpy()  # (1, T, n_src)
        for s in range(est.shape[-1]):
            out_dir = os.path.join(args.output, f"s{s}")
            os.makedirs(out_dir, exist_ok=True)
            write_wav(os.path.join(out_dir, name),
                      np.asarray(est[0, :, s]), args.fs)
    print(f"separated {len(wavs)} files -> {args.output}/s*/ (speechbrain)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="folder of mixture wavs")
    p.add_argument("--output", required=True)
    p.add_argument("--backend", choices=("native", "speechbrain"),
                   default="native")
    p.add_argument("--ckpt", default=None,
                   help="(native) SpeechBrain checkpoint: merged state "
                        "file or savedir with encoder/masknet/decoder.ckpt")
    p.add_argument("--num-spks", type=int, default=2)
    p.add_argument("--model-kwargs", default=None,
                   help="(native) JSON dict of SepFormer overrides, e.g. "
                        '\'{"enc_channels": 64}\'; default = published '
                        "sepformer-wsj02mix hyperparameters")
    p.add_argument("--fs", type=int, default=8000)
    p.add_argument("--bucket", type=int, default=8192,
                   help="(native) pad lengths to this multiple to bound "
                        "XLA compiles")
    p.add_argument("--model", default="speechbrain/sepformer-wsj02mix",
                   help="(speechbrain) HF hub id")
    p.add_argument("--savedir", default="./sepformer_ckpt")
    args = p.parse_args(argv)

    wavs = sorted(f for f in os.listdir(args.input)
                  if f.lower().endswith(".wav"))
    if args.backend == "native":
        _run_native(args, wavs)
    else:
        _run_speechbrain(args, wavs)


if __name__ == "__main__":
    main()
