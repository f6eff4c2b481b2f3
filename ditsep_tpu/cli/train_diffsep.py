"""Waveform-domain score training entry
(reference: src/train_diffsep.py:86-195).

    python -m ditsep_tpu.cli.train_diffsep --config diffsep \
        --data-path /data/librimix --workdir runs/diffsep
"""
from __future__ import annotations

import argparse

from ditsep_tpu.cli.common import (add_common_args, add_train_args,
                                   load_config, make_dataset,
                                   make_demo_callbacks)
from ditsep_tpu.configs import build_diffsep_trainer
from ditsep_tpu.training.loop import fit


def main(argv=None):
    p = add_train_args(add_common_args(
        argparse.ArgumentParser(description=__doc__)))
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    trainer = build_diffsep_trainer(cfg)
    train_ds = make_dataset(cfg, "train", args.data_path, args.synthetic,
                            synthetic_items=args.synthetic_items,
                            synthetic_len_s=args.synthetic_len_s)
    val_ds = make_dataset(cfg, "val", args.data_path, args.synthetic,
                          synthetic_len_s=args.synthetic_len_s,
                          synthetic_items=4)

    mesh = None
    if args.mesh:
        from ditsep_tpu.parallel import make_mesh
        mesh = make_mesh()

    batch_size = args.batch_size or cfg["datamodule"]["train"]["batch_size"]
    fs = cfg["datamodule"].get("fs", 8000)
    fit(trainer, train_ds, val_ds, workdir=args.workdir,
        max_epochs=args.max_epochs or cfg["trainer"].get("max_epochs", 1000),
        batch_size=batch_size, mesh=mesh, seed=args.seed,
        valid_max_sep_batches=cfg["model"].get("valid_max_sep_batches", 2),
        max_steps=args.max_steps, resume=args.resume,
        callbacks=make_demo_callbacks(val_ds, args.demo_every, fs=fs),
        media_fs=fs)


if __name__ == "__main__":
    main()
