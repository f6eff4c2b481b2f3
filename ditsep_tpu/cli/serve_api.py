"""Production separation API server: dynamic batching over the jitted
PC sampler (``ditsep_tpu.serving``).

Unlike ``cli/serve.py`` (the interactive demo UI, one sampler call per
request — the reference's gradio-equivalent surface), this serves a
machine-facing JSON/WAV API where CONCURRENT requests are batched into
single TPU program invocations, so throughput approaches the offline
eval harness's (docs/eval_harness_r03.json) instead of one-utterance-
at-a-time latency.

    python -m ditsep_tpu.cli.serve_api --config diffsep \
        --params runs/ema.npz --port 8000 --max-batch 8 \
        --warmup-seconds 4 8
"""
from __future__ import annotations

import argparse

import jax

from ditsep_tpu.cli.common import add_common_args, load_config
from ditsep_tpu.configs import build_diffsep_trainer


def build_engine(cfg, *, params_npz=None, max_batch=8, max_wait_ms=50.0,
                 sampler_N=30, sampler="pc", mask_padding=False,
                 max_seconds=60.0, latent=False, vae_params_npz=None,
                 mesh=None, seed=0, wire_int16=False, pipeline_depth=2):
    """Wire a BatchingEngine around a jitted separation call.

    ``latent=True`` serves the latent pipeline (VAE encode -> latent PC
    sampling -> VAE decode; reference: src/diffsep_latent.py:471-487)
    with sample-domain buckets at the VAE hop; the default serves the
    waveform pipeline with frame-block buckets."""
    from ditsep_tpu.serving import BatchingEngine

    if mask_padding:
        cfg["model"]["score_model"]["mask_padding"] = True
    fs = cfg["datamodule"].get("fs", 8000)

    if latent:
        import jax.numpy as jnp

        from ditsep_tpu.cli.train_diffsep_latent import init_vae_params
        from ditsep_tpu.configs import build_latent_trainer

        trainer = build_latent_trainer(cfg)
        n_src = trainer.cfg.n_speakers
        key = jax.random.PRNGKey(seed)
        vae_params = init_vae_params(trainer, vae_params_npz, key)
        # jit the init-path calls: eager init/encode dispatches one RPC
        # per op on a remote-attached TPU (docs/tpu_notes.md) — minutes
        # for the flagship config vs seconds jitted
        mix_lat, tgt_lat = jax.jit(
            lambda vp, m, t: trainer.encode(vp, None, m, t))(
                vae_params, jnp.zeros((1, 1, int(fs))),
                jnp.zeros((1, n_src, int(fs))))
        template = jax.jit(trainer.model.init)(
            key, tgt_lat, jnp.full((1,), 0.5), mix_lat)
        if params_npz:
            from ditsep_tpu.utils.checkpoint import load_params_npz
            params = {"params": load_params_npz(params_npz,
                                                template["params"])}
        else:
            params = template
        sep_p = jax.jit(lambda p, vp, k, y: trainer.separate_latent(
            p, vp, k, y, target_dim=y.shape[-1], N=sampler_N,
            sampler=sampler)[0])
        fn = lambda k, y: sep_p(params, vae_params, k, y)
        # latent path buckets by the VAE hop, not STFT frame blocks
        return BatchingEngine(
            fn, fs=fs, max_batch=max_batch, max_wait_ms=max_wait_ms,
            frame_spec=None,
            bucket_multiple=trainer.vae.downsampling_ratio * 16,
            max_seconds=max_seconds, mesh=mesh, seed=seed,
            wire_int16=wire_int16, pipeline_depth=pipeline_depth)

    trainer = build_diffsep_trainer(cfg)
    n_src = trainer.cfg.n_speakers
    sm = cfg["model"]["score_model"]
    frame_spec = (sm.get("n_fft", 510), sm.get("hop_length", 128), 64)

    from ditsep_tpu.cli.common import init_or_load_score_params
    params = init_or_load_score_params(trainer, n_src, int(fs), params_npz)

    if mask_padding:
        fn = jax.jit(lambda k, y, lens: trainer.separate(
            params, k, y, N=sampler_N, sampler=sampler,
            lengths=lens)[0])
    else:
        fn = jax.jit(lambda k, y: trainer.separate(
            params, k, y, N=sampler_N, sampler=sampler)[0])
    return BatchingEngine(fn, fs=fs, max_batch=max_batch,
                          max_wait_ms=max_wait_ms, frame_spec=frame_spec,
                          max_seconds=max_seconds,
                          pass_lengths=mask_padding, mesh=mesh, seed=seed,
                          wire_int16=wire_int16,
                          pipeline_depth=pipeline_depth)


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--params", default=None, help="npz score-model params")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=50.0)
    p.add_argument("--max-seconds", type=float, default=60.0,
                   help="reject utterances longer than this")
    p.add_argument("--sampler-N", type=int, default=30)
    p.add_argument("--sampler", choices=("pc", "ab2"), default="pc",
                   help="ab2 = 2nd-order multistep (one score eval per "
                        "step, half the NFE of pc at equal N) on either "
                        "the waveform or --latent path; matched-quality "
                        "operating points measured in docs/nfe_study.json "
                        "and docs/latent_nfe_r05.json")
    p.add_argument("--mask-padding", action="store_true",
                   help="padding-robust scoring (per-request lengths "
                        "masked out of normalization/attention stats; "
                        "see docs/pad_dilution_r03.md)")
    p.add_argument("--latent", action="store_true",
                   help="serve the latent pipeline (VAE encode -> latent "
                        "PC sampling -> decode); use with --config "
                        "latent_diffsep_ouve and --vae-params")
    p.add_argument("--vae-params", default=None,
                   help="npz with OobleckVAE params (latent mode)")
    p.add_argument("--wire-int16", action="store_true",
                   help="move audio host<->device as int16 (WAV-16 "
                        "resolution, the API's own output width) — "
                        "halves the transfer volume that dominates "
                        "served latency on remote-attached TPUs "
                        "(docs/serving_bench.json)")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="max in-flight batches: >=2 overlaps host<->"
                        "device audio transfers with the next batch's "
                        "compute (the dominant served-latency term on "
                        "remote-attached TPUs); 1 = strict "
                        "upload->compute->download serialization")
    p.add_argument("--stream-chunk-seconds", type=float, default=8.0,
                   help="default window for /v1/stream sessions")
    p.add_argument("--stream-overlap-seconds", type=float, default=1.0,
                   help="default overlap for /v1/stream sessions")
    p.add_argument("--warmup-seconds", type=float, nargs="*", default=(),
                   help="pre-compile programs for these utterance "
                        "lengths before accepting traffic")
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    mesh = None
    if args.mesh:
        from ditsep_tpu.parallel import make_mesh
        mesh = make_mesh()

    engine = build_engine(
        cfg, params_npz=args.params, max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms, sampler_N=args.sampler_N,
        sampler=args.sampler, mask_padding=args.mask_padding,
        max_seconds=args.max_seconds, latent=args.latent,
        vae_params_npz=args.vae_params, mesh=mesh, seed=args.seed,
        wire_int16=args.wire_int16, pipeline_depth=args.pipeline_depth)
    fs = engine.fs
    if args.warmup_seconds:
        print(f"[serve_api] warming up {len(args.warmup_seconds)} "
              f"shape(s)...")
        engine.warmup([int(s * fs) for s in args.warmup_seconds])

    from ditsep_tpu.serving import SeparationAPIServer
    server = SeparationAPIServer(
        engine, host=args.host, port=args.port,
        n_src=cfg["model"].get("n_speakers", 2),
        stream_chunk_seconds=args.stream_chunk_seconds,
        stream_overlap_seconds=args.stream_overlap_seconds,
    )
    install_graceful_shutdown(server, engine)
    server.serve_forever()


def install_graceful_shutdown(server, engine):
    """SIGTERM/SIGINT drain: stop accepting connections, let the
    engine finish its pending batches, then exit — so an orchestrator's
    stop (or Ctrl-C) never drops in-flight separations. The actual
    close runs on a helper thread because ``HTTPServer.shutdown`` must
    not be called from the thread running ``serve_forever`` (the
    signal handler executes on it)."""
    import signal
    import threading

    def drain():
        print("[serve_api] draining: closing listener, finishing "
              "pending batches...")
        server.close()
        # _take_batch dispatches whatever is pending once closed; allow
        # several full sampler calls before giving up the join
        engine.close(timeout=120.0)
        print("[serve_api] drained, exiting")

    def handler(signum, frame):
        threading.Thread(target=drain, daemon=False,
                         name="ditsep-drain").start()

    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, handler)


if __name__ == "__main__":
    main()
