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
    log_media: bool = True,
    media_fs: int = 8000,
    prefetch_depth: int = 0,
    callbacks: tuple = (),
):
    """Train a DiffSepTrainer (or compatible) to convergence."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    # multi-host: only process 0 writes metrics/checkpoints/config (the
    # reference's rank gating, src/utils/ddp.py:4-10); every process
    # still restores on resume
    from ditsep_tpu.parallel import is_rank_zero
    rank_zero = is_rank_zero()
    logger = MetricsLogger(workdir, enabled=rank_zero)
    ckpt = CheckpointManager(f"{workdir}/checkpoints",
                             monitor="val/si_sdr", mode="max",
                             save_top_k=save_top_k, write=rank_zero)
    # persist the run config next to the checkpoints (the reference
    # co-locates hparams.yaml and re-reads it at eval,
    # reference: src/evaluate_mp.py:40-79)
    if rank_zero:
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

    # jit train AND validation: eager per-op dispatch of the val separation
    # would be per-op RPC over the device link (docs/tpu_notes.md); every
    # val function compiles once per bucket shape and is reused across
    # epochs.
    val_kw = {"N": val_sampler_N} if val_sampler_N is not None else {}

    def _val_sep(params, key, batch):
        return trainer.val_separation_metrics(params, key, batch,
                                              return_est=True, **val_kw)

    if mesh is not None:
        data_sh = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        state = jax.device_put(state, repl)
        step_fn = jax.jit(trainer.train_step,
                          in_shardings=(repl, repl, (data_sh, data_sh)),
                          out_shardings=(repl, repl))
        batch_sh = (repl, repl, (data_sh, data_sh))
        val_loss_fn = jax.jit(trainer.val_score_loss, in_shardings=batch_sh)
        val_sep_fn = jax.jit(_val_sep, in_shardings=batch_sh)
    else:
        step_fn = jax.jit(trainer.train_step)
        val_loss_fn = jax.jit(trainer.val_score_loss)
        val_sep_fn = jax.jit(_val_sep)

    loader = BucketedLoader(train_dataset, batch_size=batch_size,
                            n_buckets=n_buckets, multiple=bucket_multiple,
                            shuffle=True, seed=seed)
    val_loader = None
    if val_dataset is not None:
        # val separation drives checkpoint selection (monitor val/si_sdr,
        # reference: src/train_diffsep.py:116-124): pad val batches only
        # within each utterance's own 64-frame STFT block, else the
        # added GroupNorm dilution distorts the monitored metric
        # (docs/pad_dilution_r03.md). Latent/VAE models (no n_fft) keep
        # sample-domain buckets.
        m = trainer.model
        frame_spec = ((m.n_fft, m.hop_length, 64)
                      if hasattr(m, "n_fft") and hasattr(m, "hop_length")
                      else None)
        # align="left": val padding must be TRAILING quiet — the layout
        # the model sees at native lengths and in the test-eval harness
        # (train batches keep the reference's centered collation)
        val_loader = BucketedLoader(val_dataset, batch_size=batch_size,
                                    n_buckets=2, multiple=bucket_multiple,
                                    shuffle=False, frame_spec=frame_spec,
                                    align="left", yield_counts=True)

    global_step = int(state.step)
    progress = {"state": state, "step": global_step}
    try:
        state, global_step = _train_epochs(
            trainer, state, loader, val_loader, step_fn, val_loss_fn,
            val_sep_fn, key, mesh, logger, ckpt, global_step, max_epochs,
            max_steps, log_every, valid_max_sep_batches, seed,
            log_media, media_fs, prefetch_depth, callbacks,
            progress=progress)
    except Exception:
        # emergency checkpoint so a crash loses at most one epoch;
        # save the LIVE state from the progress holder — the local
        # `state` still binds the pre-training value when
        # _train_epochs raises (the reference only prints exceptions,
        # src/train_ldm.py:16-18)
        try:
            ckpt.save_latest(progress["state"], progress["step"])
        except Exception:
            pass
        raise
    logger.close()
    return state


def _prefetch(iterable, prepare, depth: int = 2):
    """Run `prepare` (host collate + device_put) for upcoming items on a
    background thread (the reference leans on torch DataLoader workers,
    src/config/diffsep/datamodule/default.yaml:3).

    MEASURED to be counterproductive on a single-vCPU host
    (docs/prefetch_bench.json: -35% steps/s): JAX's async dispatch
    already overlaps host prep with device execution, and the extra
    thread only adds GIL contention. fit() therefore defaults to
    prefetch_depth=0 (plain interleaving); enable the thread on
    multi-core hosts where collation is genuinely expensive."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()

    def worker():
        try:
            for item in iterable:
                if stop.is_set():
                    return
                prepared = prepare(item)
                while not stop.is_set():
                    try:
                        q.put(prepared, timeout=0.2)
                        break
                    except queue.Full:
                        continue
            q.put(sentinel)
        except BaseException as e:  # surface loader errors in main thread
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # abandoning the generator (max_steps break, exception) must not
        # leave the worker blocked on a full queue pinning device-
        # resident batches for the life of the process
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5)


def _log_val_media(logger, batch, est, step: int, fs: int) -> None:
    """Rich-media validation demos: separated wavs + spectrogram grid for
    the first utterance of the first val batch (reference:
    src/ldm.py:630-726 LDMDemoCallback,
    src/stable_audio_tools/training/utils.py:117-148)."""
    import numpy as np

    try:
        from ditsep_tpu.viz import separation_figure
        mix = np.asarray(batch[0][0]).reshape(-1)
        tgt = np.asarray(batch[1][0])
        e = np.asarray(est[0])
        logger.log_audio("val/mix", mix, step, fs)
        for i in range(e.shape[0]):
            logger.log_audio(f"val/est_{i}", e[i], step, fs)
        logger.log_figure(
            "val/spectrograms", separation_figure(mix, e, tgt, fs=fs), step)
    except Exception:
        # media logging must never take down a training run
        pass


def _train_epochs(trainer, state, loader, val_loader, step_fn, val_loss_fn,
                  val_sep_fn, key, mesh, logger, ckpt, global_step,
                  max_epochs, max_steps, log_every, valid_max_sep_batches,
                  seed, log_media=True, media_fs=8000, prefetch_depth=0,
                  callbacks=(), progress=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is not None:
        data_sh = NamedSharding(mesh, P("data"))
        prepare = lambda b: jax.device_put(
            (jnp.asarray(b[0]), jnp.asarray(b[1])), data_sh)
    else:
        prepare = lambda b: (jnp.asarray(b[0]), jnp.asarray(b[1]))

    stop = False
    for epoch in range(max_epochs):
        loader.seed = seed + epoch
        batches = (_prefetch(loader, prepare, prefetch_depth)
                   if prefetch_depth > 0
                   else (prepare(b) for b in loader))
        for batch in batches:
            key, k_step = jax.random.split(key)
            state, metrics = step_fn(state, k_step, batch)
            global_step += 1
            if progress is not None:
                # live view for fit()'s emergency checkpoint: a crash
                # must save THIS state, not the pre-training one
                progress["state"] = state
                progress["step"] = global_step
            if global_step % log_every == 0:
                logger.log({k: float(v) for k, v in metrics.items()},
                           global_step)
            # step callbacks (the reference's Lightning callback hook
            # point; reference:
            # src/stable_audio_tools/training/factory.py:160-245).
            # fit()'s contract: a callback exposes due(step) and
            # __call__(logger, step, trainer, state, key) — the
            # SeparationDemoCallback shape. The stable-audio factory
            # demo callbacks (training/demo.py) have DIFFERENT
            # signatures and are driven by cli/train_stable, not here.
            # Failures must never take down a training run (media only).
            for cb in callbacks:
                if cb.due(global_step):
                    key, k_cb = jax.random.split(key)
                    try:
                        cb(logger, global_step, trainer, state, k_cb)
                    except Exception as e:  # pragma: no cover
                        print(f"[fit] callback {type(cb).__name__} "
                              f"failed at step {global_step}: {e}")
            if max_steps is not None and global_step >= max_steps:
                stop = True
                break

        # ---- validation ------------------------------------------------
        val_metrics: Dict[str, float] = {}
        if val_loader is not None:
            score_losses = []
            si_sdrs = []
            weights = []
            sep_weights = []
            n_sep = 0
            for mix_b, tgt_b, n_real in val_loader:
                key, k1, k2 = jax.random.split(key, 3)
                batch = (jnp.asarray(mix_b), jnp.asarray(tgt_b))
                if mesh is not None:
                    batch = jax.tree.map(
                        lambda x: jax.device_put(
                            x, NamedSharding(mesh, P("data"))), batch)
                score_losses.append(float(jnp.mean(
                    val_loss_fn(state.params, k1, batch))))
                weights.append(n_real)
                if n_sep < valid_max_sep_batches:
                    n_sep += 1
                    # EMA params at eval, reference src/diffsep.py:586-606
                    m, est = val_sep_fn(state.ema_params, k2, batch)
                    si_sdrs.append(float(m["val/si_sdr"]))
                    sep_weights.append(n_real)
                    if n_sep == 1 and log_media:
                        _log_val_media(logger, batch, est, global_step,
                                       media_fs)
            # weight batch means by their REAL item count: remainder
            # batches are padded by cycling real items (BucketedLoader),
            # so an unweighted mean would overweight them
            if score_losses:
                val_metrics["val/score_loss"] = float(
                    np.average(score_losses, weights=weights))
            if si_sdrs:
                val_metrics["val/si_sdr"] = float(
                    np.average(si_sdrs, weights=sep_weights))
            logger.log(val_metrics, global_step)
            ckpt.save(state, global_step, val_metrics)
        # rolling latest checkpoint every epoch regardless of validation
        # (training without a val set must still be crash-resumable)
        ckpt.save_latest(state, global_step)
        if stop:
            break
    return state, global_step
