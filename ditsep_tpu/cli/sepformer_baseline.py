"""SepFormer baseline separation for comparison runs.

Counterpart of the reference's SpeechBrain baseline script
(reference: scripts/sepformer.py:1-20): separate a folder of mixtures
with the pretrained speechbrain/sepformer-wsj02mix model and write
s0/ s1/ outputs in the same layout as ditsep_tpu.cli.separate, so the
two systems' outputs diff directly. Gated on the optional `speechbrain`
package (torch inference on host -- the baseline is a torch model; this
framework's own separator is the TPU path).

    python -m ditsep_tpu.cli.sepformer_baseline \
        --input mixtures/ --output baseline_out/
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="folder of mixture wavs")
    p.add_argument("--output", required=True)
    p.add_argument("--model", default="speechbrain/sepformer-wsj02mix")
    p.add_argument("--savedir", default="./sepformer_ckpt")
    args = p.parse_args(argv)

    try:
        from speechbrain.inference.separation import (
            SepformerSeparation as Sepformer)
    except ImportError as e:
        raise SystemExit(
            "speechbrain is not installed in this image; install it in a "
            "baseline-eval environment to run the SepFormer comparison "
            "(reference: scripts/sepformer.py)") from e

    import numpy as np

    from ditsep_tpu.data.wsj0_mix import write_wav

    model = Sepformer.from_hparams(source=args.model, savedir=args.savedir)
    wavs = sorted(f for f in os.listdir(args.input)
                  if f.lower().endswith(".wav"))
    for name in wavs:
        est = model.separate_file(path=os.path.join(args.input, name))
        est = est.detach().cpu().numpy()  # (1, T, n_src)
        for s in range(est.shape[-1]):
            out_dir = os.path.join(args.output, f"s{s}")
            os.makedirs(out_dir, exist_ok=True)
            write_wav(os.path.join(out_dir, name),
                      np.asarray(est[0, :, s]), 8000)
    print(f"separated {len(wavs)} files -> {args.output}/s*/")


if __name__ == "__main__":
    main()
