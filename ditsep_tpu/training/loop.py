"""The training loop: fit() driving jitted train steps over bucketed data.

Replaces the reference's Lightning Trainer orchestration
(reference: src/train_diffsep.py:86-195): epochs over a bucketed loader,
periodic scalar logging (every 10 steps, reference src/diffsep.py:453-462),
per-epoch validation (score loss + up to `valid_max_sep_batches` actual
separations scored with SI-SDR, reference src/diffsep.py:474-500), top-k
checkpointing on val/si_sdr, and optional mesh sharding of the batch axis.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ditsep_tpu.data.wsj0_mix import BucketedLoader
from ditsep_tpu.utils.checkpoint import CheckpointManager
from ditsep_tpu.utils.logging import MetricsLogger


def _save_run_config(workdir: str, trainer) -> None:
    import dataclasses
    import json
    from pathlib import Path

    rec = {}
    try:
        rec["trainer_cfg"] = dataclasses.asdict(trainer.cfg)
        rec["sde"] = {"kind": type(trainer.sde).__name__,
                      **dataclasses.asdict(trainer.sde)}
        model = trainer.model
        rec["model"] = {k: v for k, v in vars(model).items()
                        if isinstance(v, (int, float, str, bool, tuple,
                                          list))}
    except Exception:
        pass
    Path(workdir).mkdir(parents=True, exist_ok=True)
    with open(Path(workdir) / "hparams.json", "w") as f:
        json.dump(rec, f, indent=1, default=str)


def fit(
    trainer,
    train_dataset,
    val_dataset=None,
    *,
    workdir: str,
    max_epochs: int = 1000,
    batch_size: int = 16,
    n_buckets: int = 6,
    bucket_multiple: int = 4096,
    mesh=None,
    seed: int = 0,
    valid_max_sep_batches: int = 2,
    val_sampler_N: Optional[int] = None,
    log_every: int = 10,
    save_top_k: int = 20,
    resume: bool = False,
    max_steps: Optional[int] = None,
    init_params=None,
):
    """Train a DiffSepTrainer (or compatible) to convergence."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    logger = MetricsLogger(workdir)
    ckpt = CheckpointManager(f"{workdir}/checkpoints",
                             monitor="val/si_sdr", mode="max",
                             save_top_k=save_top_k)
    # persist the run config next to the checkpoints (the reference
    # co-locates hparams.yaml and re-reads it at eval,
    # reference: src/evaluate_mp.py:40-79)
    _save_run_config(workdir, trainer)
    key = jax.random.PRNGKey(seed)

    # init params from one example batch
    if init_params is None:
        mix0, tgt0 = train_dataset[0]
        key, k_init = jax.random.split(key)
        init_params = jax.jit(trainer.model.init)(
            k_init, jnp.asarray(tgt0[None]),
            jnp.full((1,), 0.5, jnp.float32), jnp.asarray(mix0[None]))
    state = trainer.init_state(init_params)
    if resume:
        try:
            # resume from the rolling latest checkpoint (NOT the
            # best-metric one, which may be far behind)
            state = ckpt.restore(state, prefer="latest")
        except FileNotFoundError:
            pass

    in_shardings = None
    if mesh is not None:
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        step_fn = jax.jit(trainer.train_step,
                          in_shardings=(repl, repl, (data_sh, data_sh)),
                          out_shardings=(repl, repl))
    else:
        step_fn = jax.jit(trainer.train_step)

    loader = BucketedLoader(train_dataset, batch_size=batch_size,
                            n_buckets=n_buckets, multiple=bucket_multiple,
                            shuffle=True, seed=seed)
    val_loader = None
    if val_dataset is not None:
        val_loader = BucketedLoader(val_dataset, batch_size=batch_size,
                                    n_buckets=2, multiple=bucket_multiple,
                                    shuffle=False)

    global_step = int(state.step)
    stop = False
    try:
        state, global_step = _train_epochs(
            trainer, state, loader, val_loader, step_fn, key, mesh,
            logger, ckpt, global_step, max_epochs, max_steps, log_every,
            valid_max_sep_batches, val_sampler_N, seed)
    except Exception:
        # emergency checkpoint so a crash loses at most one epoch
        # (the reference only prints exceptions, src/train_ldm.py:16-18)
        try:
            ckpt.save_latest(state, global_step)
        except Exception:
            pass
        raise
    logger.close()
    return state


def _train_epochs(trainer, state, loader, val_loader, step_fn, key, mesh,
                  logger, ckpt, global_step, max_epochs, max_steps,
                  log_every, valid_max_sep_batches, val_sampler_N, seed):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    stop = False
    for epoch in range(max_epochs):
        loader.seed = seed + epoch
        for mix_b, tgt_b in loader:
            key, k_step = jax.random.split(key)
            batch = (jnp.asarray(mix_b), jnp.asarray(tgt_b))
            if mesh is not None:
                batch = jax.tree.map(
                    lambda x: jax.device_put(
                        x, NamedSharding(mesh, P("data"))), batch)
            state, metrics = step_fn(state, k_step, batch)
            global_step += 1
            if global_step % log_every == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           global_step)
            if max_steps is not None and global_step >= max_steps:
                stop = True
                break

        # ---- validation ------------------------------------------------
        val_metrics: Dict[str, float] = {}
        if val_loader is not None:
            score_losses = []
            si_sdrs = []
            n_sep = 0
            for mix_b, tgt_b in val_loader:
                key, k1, k2 = jax.random.split(key, 3)
                batch = (jnp.asarray(mix_b), jnp.asarray(tgt_b))
                score_losses.append(float(jnp.mean(
                    trainer.val_score_loss(state.params, k1, batch))))
                if n_sep < valid_max_sep_batches:
                    n_sep += 1
                    m = trainer.val_separation_metrics(
                        state.ema_params, k2, batch,
                        **({"N": val_sampler_N}
                           if val_sampler_N is not None else {}))
                    si_sdrs.append(float(m["val/si_sdr"]))
            if score_losses:
                val_metrics["val/score_loss"] = float(
                    np.mean(score_losses))
            if si_sdrs:
                val_metrics["val/si_sdr"] = float(np.mean(si_sdrs))
            logger.log(val_metrics, global_step)
            ckpt.save(state, global_step, val_metrics)
        # rolling latest checkpoint every epoch regardless of validation
        # (training without a val set must still be crash-resumable)
        ckpt.save_latest(state, global_step)
        if stop:
            break
    return state, global_step
