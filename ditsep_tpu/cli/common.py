"""Shared CLI plumbing: config resolution, dataset construction."""
from __future__ import annotations

import argparse
import ast
from typing import Dict, Optional

from ditsep_tpu.configs import CONFIG_FAMILIES, override


def parse_overrides(pairs) -> Dict[str, object]:
    """Parse 'a.b.c=value' CLI overrides (hydra-style)."""
    out = {}
    for p in pairs or []:
        k, _, v = p.partition("=")
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def load_config(name: str, overrides=None):
    if name not in CONFIG_FAMILIES:
        raise SystemExit(
            f"unknown config {name!r}; choose from "
            f"{sorted(CONFIG_FAMILIES)}")
    return override(CONFIG_FAMILIES[name](), parse_overrides(overrides))


def make_dataset(cfg, split: str, data_path: Optional[str],
                 synthetic: bool = False, synthetic_items: int = 16,
                 synthetic_len_s: Optional[float] = None):
    if synthetic or data_path is None:
        from ditsep_tpu.data import SyntheticMixDataset
        kw = {}
        if synthetic_len_s is not None:
            # fixed-length items -> one bucket shape -> one XLA compile
            kw = {"min_len_s": synthetic_len_s,
                  "max_len_s": synthetic_len_s}
        return SyntheticMixDataset(
            n_items=synthetic_items,
            n_spkr=cfg["datamodule"].get("n_spkr", 2),
            fs=cfg["datamodule"].get("fs", 8000), **kw)
    dm = cfg["datamodule"]
    if dm.get("dataset") == "vctk_demand":
        # enhancement family: clean+noise "2-source separation" pairs
        # (reference: src/train_diffsep.py:131-134 selects the Valentini
        # datamodule when cfg.name == "enhancement")
        from ditsep_tpu.data import NoisyDataset
        return NoisyDataset(
            path=data_path, split=split, fs=dm.get("fs", 16000),
            len_s=dm.get("max_len_s") if split == "train" else None)
    from ditsep_tpu.data import WSJ0Mix
    return WSJ0Mix(
        path=data_path, n_spkr=dm.get("n_spkr", 2), cut=dm.get("cut", "max"),
        split=dm[split]["split"], fs=dm.get("fs", 8000),
        max_len_s=dm.get("max_len_s") if split == "train" else None)


def force_cpu():
    """Pin JAX to CPU (the axon TPU plugin overrides JAX_PLATFORMS, so the
    config flag is the reliable switch)."""
    import jax
    jax.config.update("jax_platforms", "cpu")


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--cpu", action="store_true",
                   help="run on CPU even when a TPU is attached")
    p.add_argument("--config", default="diffsep")
    p.add_argument("--data-path", default=None,
                   help="dataset root (wsj0-mix / LibriMix layout)")
    p.add_argument("--synthetic", action="store_true",
                   help="use the synthetic dataset (smoke runs)")
    p.add_argument("--synthetic-items", type=int, default=16,
                   help="synthetic dataset size")
    p.add_argument("--synthetic-len-s", type=float, default=None,
                   help="fixed synthetic utterance length in seconds "
                        "(one bucket shape -> one compile)")
    p.add_argument("--workdir", default="./runs/exp")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--max-epochs", type=int, default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--mesh", action="store_true",
                   help="shard the batch over all devices")
    p.add_argument("--override", nargs="*", default=[],
                   help="config overrides a.b.c=value")
    return p


def add_train_args(p: argparse.ArgumentParser):
    """Flags shared by the diffsep-family train entries (reference
    equivalents: resume_from_checkpoint src/train_diffsep.py:174-180;
    demo callbacks src/ldm.py:630-726 LDMDemoCallback)."""
    p.add_argument("--resume", action="store_true",
                   help="resume from the workdir's rolling latest "
                        "checkpoint (fresh start if none exists)")
    p.add_argument("--demo-every", type=int, default=0,
                   help="log demo separations (mix/est/target wavs) "
                        "every N steps (0 = off)")
    return p


def make_demo_callbacks(dataset, demo_every: int, fs: int = 8000,
                        n_items: int = 2):
    """SeparationDemoCallback over the first `n_items` of `dataset`,
    for training.loop.fit(callbacks=...). Returns () when disabled."""
    if not demo_every or dataset is None or len(dataset) == 0:
        return ()
    from ditsep_tpu.data.wsj0_mix import max_collator
    from ditsep_tpu.training.demo import SeparationDemoCallback

    items = [dataset[i] for i in range(min(n_items, len(dataset)))]
    return (SeparationDemoCallback(
        demo_batch=max_collator(items), demo_every=demo_every,
        sample_rate=fs),)


def init_or_load_score_params(trainer, n_src: int, t_len: int,
                              params_npz: Optional[str] = None,
                              seed: int = 0):
    """Init score-model params on a template shape; load an npz
    checkpoint over the template when given.

    The score models are length-agnostic, so any ``t_len`` yields the
    same parameter tree — CLIs init on a cheap template and (optionally)
    overwrite with trained weights. Shared by serve/serve_api/separate.
    """
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    template = trainer.model.init(
        key, jnp.zeros((1, n_src, t_len)), jnp.full((1,), 0.5),
        jnp.zeros((1, 1, t_len)))
    if params_npz:
        from ditsep_tpu.utils.checkpoint import load_params_npz
        return {"params": load_params_npz(params_npz, template["params"])}
    return template
