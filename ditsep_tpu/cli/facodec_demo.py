"""FACodec reconstruction demo: encode -> FVQ quantize -> decode wavs.

Re-design of the reference demo (reference: scripts/facodec_inference.py,
src/models/facodec/inference.py): per input wav, run the FACodec
encoder (hop 200 @ 16 kHz), the decoder's factorized-VQ stages + timbre
conditioning, and write `<name>_reconstructed.wav` plus the code indices
as `<name>_codes.npy`. The reference downloads pretrained weights from
the HF hub (amphion/naturalspeech3_facodec) -- egress is unavailable in
this image, so weights come from --params (npz) or random init (pipeline
demonstration; reconstruction is then untrained).

    python -m ditsep_tpu.cli.facodec_demo --in-dir wavs/ --out-dir out/
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--in-dir", required=True, help="directory of .wav")
    p.add_argument("--out-dir", required=True)
    p.add_argument("--params", default=None,
                   help="npz of trained params (random init otherwise)")
    p.add_argument("--fs", type=int, default=16000,
                   help="FACodec operating rate (reference: 16 kHz)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()

    from ditsep_tpu.data.wsj0_mix import read_wav, write_wav
    from ditsep_tpu.models.facodec import FACodecDecoder, FACodecEncoder

    enc = FACodecEncoder(ngf=32, up_ratios=(2, 4, 5, 5), out_channels=256)
    # the shipped FACodec wrapper's decoder config (reference:
    # facodec.py:629-640: upsample_initial_channel=1024, vq_dim=256)
    dec = FACodecDecoder(in_channels=256, ngf=32, up_ratios=(5, 5, 4, 2),
                         upsample_initial_channel=1024)
    hop = enc.hop_length

    key = jax.random.PRNGKey(0)
    probe = jnp.zeros((1, 1, hop * 8))
    enc_params = enc.init(key, probe)
    dec_params = dec.init(key, enc.apply(enc_params, probe),
                          return_info=True)
    if args.params:
        from ditsep_tpu.utils.checkpoint import load_params_npz
        tree = load_params_npz(args.params, {"enc": enc_params,
                                             "dec": dec_params})
        enc_params, dec_params = tree["enc"], tree["dec"]

    @jax.jit
    def reconstruct(ep, dp, x):
        h = enc.apply(ep, x)
        return dec.apply(dp, h, return_info=True)

    os.makedirs(args.out_dir, exist_ok=True)
    wavs = sorted(f for f in os.listdir(args.in_dir)
                  if f.endswith(".wav"))
    if not wavs:
        raise SystemExit(f"no .wav files in {args.in_dir}")
    for name in wavs:
        audio, fs = read_wav(os.path.join(args.in_dir, name))
        if fs != args.fs:
            from ditsep_tpu.data.webdataset import _resample
            audio = _resample(np.atleast_2d(audio), fs, args.fs)
        audio = np.atleast_2d(audio)[:1]  # mono
        t = audio.shape[-1]
        pad = (-t) % hop
        x = jnp.asarray(np.pad(audio, ((0, 0), (0, pad)))[None],
                        jnp.float32)  # (1, 1, T)
        rec, info = reconstruct(enc_params, dec_params, x)
        rec = np.asarray(rec)[0, 0, :t]
        stem = os.path.splitext(name)[0]
        write_wav(os.path.join(args.out_dir,
                               f"{stem}_reconstructed.wav"), rec, args.fs)
        np.save(os.path.join(args.out_dir, f"{stem}_codes.npy"),
                np.asarray(info["indices"][0]))
        print(f"{name}: {t} samples -> codes "
              f"{tuple(info['indices'].shape[1:])}, vq_loss "
              f"{float(info['vq_loss']):.4f}")


if __name__ == "__main__":
    main()
