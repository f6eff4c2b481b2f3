"""Model inspection: print the parameter inventory of any configured model.

Capability port of the reference's debug probes (scripts/vae_print.py,
scripts/facodec_print.py, scripts/debug.py, scripts/load_vae_stable.py —
all of which instantiate a model and print its module tree). Here the
inventory comes from ``jax.eval_shape`` over the model's ``init``, so no
parameter memory is allocated and no FLOPs run — inspecting the flagship
nf=128 model is instant even on a 1-vCPU host.

Usage:
    python -m ditsep_tpu.cli.model_info --config diffsep
    python -m ditsep_tpu.cli.model_info --config latent_diffsep_ouve --latent
    python -m ditsep_tpu.cli.model_info --model-config path/to/model.json
    python -m ditsep_tpu.cli.model_info --facodec
"""
from __future__ import annotations

import argparse
import json
from typing import Any, Dict


def _flatten(tree: Dict[str, Any], prefix=""):
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if hasattr(v, "shape"):
            yield path, v
        elif isinstance(v, dict):
            yield from _flatten(v, path)


def summarize_params(shapes: Dict[str, Any], depth: int = 1):
    """Group the eval_shape tree by its first ``depth`` path segments."""
    import numpy as np
    groups: Dict[str, int] = {}
    total = 0
    for path, leaf in _flatten(shapes):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        key = "/".join(path.split("/")[:depth])
        groups[key] = groups.get(key, 0) + n
    return groups, total


def print_inventory(name: str, shapes: Dict[str, Any], depth: int):
    groups, total = summarize_params(shapes, depth)
    print(f"\n{name}: {total:,} parameters")
    width = max((len(k) for k in groups), default=0)
    for k, n in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"  {k:<{width}}  {n:>12,}  ({100 * n / total:5.1f}%)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None,
                   help="experiment family (diffsep / diffsep_ouve / "
                        "diffsep_sb / latent_diffsep_ouve / ldm)")
    p.add_argument("--model-config", default=None,
                   help="stable-audio JSON model config path")
    p.add_argument("--facodec", action="store_true",
                   help="inventory the FACodec encoder/decoder")
    p.add_argument("--latent", action="store_true")
    p.add_argument("--override", nargs="*", default=[])
    p.add_argument("--depth", type=int, default=2,
                   help="module-path depth for grouping")
    p.add_argument("--length", type=int, default=4096,
                   help="dummy input length in samples")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    t_len = args.length

    if args.facodec:
        from ditsep_tpu.models.facodec import FACodecDecoder, FACodecEncoder
        enc = FACodecEncoder()
        x = jnp.zeros((1, 1, (t_len // enc.hop_length) * enc.hop_length))
        es = jax.eval_shape(enc.init, key, x)
        print_inventory("FACodecEncoder", es["params"], args.depth)
        h = jax.eval_shape(lambda p, x: enc.apply(p, x), es, x)
        dec = FACodecDecoder()
        ds = jax.eval_shape(dec.init, key, jax.ShapeDtypeStruct(
            h.shape, h.dtype))
        print_inventory("FACodecDecoder", ds["params"], args.depth)
        return

    if args.model_config:
        from ditsep_tpu.models.factory import create_model_from_config
        cfg = json.load(open(args.model_config))
        obj = create_model_from_config(cfg)
        mtype = cfg["model_type"]
        if mtype == "autoencoder":
            x = jnp.zeros((1, getattr(obj, "in_channels", 1), t_len))
            s = jax.eval_shape(obj.init, key, x)
            print_inventory(type(obj).__name__, s["params"], args.depth)
        elif mtype == "lm":
            lm, pattern = obj
            toks = jnp.zeros((1, lm.n_quantizers, 32), jnp.int32)
            s = jax.eval_shape(lm.init, key, toks)
            print(f"pattern: {type(pattern).__name__}")
            print_inventory("AudioLM", s["params"], args.depth)
        else:
            print(f"model_type={mtype}: {obj!r}")
        return

    if not args.config:
        p.error("one of --config / --model-config / --facodec is required")

    from ditsep_tpu.cli.common import load_config
    cfg = load_config(args.config, args.override)
    n_src = cfg["model"].get("n_speakers", 2)
    mix = jnp.zeros((1, 1, t_len))
    tgt = jnp.zeros((1, n_src, t_len))
    tv = jnp.zeros((1,))

    if args.latent or args.config.startswith("latent"):
        from ditsep_tpu.configs import build_latent_trainer
        trainer = build_latent_trainer(cfg)
        vs = jax.eval_shape(trainer.vae.init, key, mix)
        print_inventory("OobleckVAE", vs["params"], args.depth)
        hop = 1
        for s in trainer.vae.strides:
            hop *= int(s)
        d, tl = trainer.vae.latent_dim, max(t_len // hop, 1)
        mean = jax.ShapeDtypeStruct((1, n_src, d, tl), jnp.float32)
        mixl = jax.ShapeDtypeStruct((1, 1, d, tl), jnp.float32)
        ss = jax.eval_shape(trainer.model.init, key, mean, tv, mixl)
        print_inventory("LatentScoreModelNCSNpp", ss["params"], args.depth)
    else:
        from ditsep_tpu.configs import build_diffsep_trainer
        trainer = build_diffsep_trainer(cfg)
        ss = jax.eval_shape(trainer.model.init, key, tgt, tv, mix)
        print_inventory(type(trainer.model).__name__, ss["params"],
                        args.depth)
    print(f"\nsde: {trainer.sde}")


if __name__ == "__main__":
    main()
