"""Export a training checkpoint to bare inference weights.

Re-design of the reference unwrap tool (reference:
src/training/unwrap_model.py:7-135): strips a TrainState (or any orbax
checkpoint) down to the plain (EMA) parameter tree and writes a flat npz
the evaluation/inference CLIs consume.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ckpt-dir", required=True,
                   help="checkpoint directory (CheckpointManager layout)")
    p.add_argument("--out", required=True, help="output .npz path")
    p.add_argument("--use-ema", action="store_true", default=True)
    p.add_argument("--no-ema", dest="use_ema", action="store_false")
    p.add_argument("--which", default="best",
                   choices=["best", "latest"])
    args = p.parse_args(argv)

    import orbax.checkpoint as ocp
    from pathlib import Path

    from ditsep_tpu.utils.checkpoint import CheckpointManager, \
        save_params_npz

    mgr = CheckpointManager(args.ckpt_dir)
    path = mgr.best_path() if args.which == "best" else mgr.latest_path()
    if path is None:
        raise SystemExit(f"no checkpoints in {args.ckpt_dir}")
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(Path(path).absolute())
    key = "ema_params" if args.use_ema and "ema_params" in state \
        else "params"
    params = state[key]
    # unwrap the flax 'params' collection if present
    if isinstance(params, dict) and set(params) == {"params"}:
        params = params["params"]
    save_params_npz(args.out, {"params": params})
    print(f"wrote {args.out} from {path} ({key})")


if __name__ == "__main__":
    main()
