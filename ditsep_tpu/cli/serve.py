"""Demo web server CLI (reference: src/inference/run_gradio.py:7-32).

Serves the separation demo (and optionally the autoencoder round-trip
tab) over the dependency-free stdlib HTTP UI in
``ditsep_tpu.interface.web`` — the TPU-image equivalent of the
reference's gradio entry point. With the optional ``gradio`` package
installed, ``--gradio`` launches the widget shell instead.

    python -m ditsep_tpu.cli.serve --config diffsep \
        --params runs/ema.npz --port 7860
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ditsep_tpu.cli.common import add_common_args, load_config
from ditsep_tpu.configs import build_diffsep_trainer


def build_separation_app(cfg, params_npz=None):
    from ditsep_tpu.interface import SeparationApp

    trainer = build_diffsep_trainer(cfg)
    n_src = trainer.cfg.n_speakers
    fs = cfg["datamodule"].get("fs", 8000)
    from ditsep_tpu.cli.common import init_or_load_score_params
    params = init_or_load_score_params(trainer, n_src, int(fs), params_npz)
    return SeparationApp(trainer=trainer, params=params, fs=fs)


def build_autoencoder_app(vae_config, vae_params=None):
    from ditsep_tpu.interface import AutoencoderApp
    from ditsep_tpu.models.factory import create_model_from_config
    import json as _json

    with open(vae_config) as f:
        mc = _json.load(f)
    vae = create_model_from_config(mc)
    fs = int(mc.get("sample_rate", 8000))
    key = jax.random.PRNGKey(0)
    params = vae.init(key, jnp.zeros((1, 1, 4096)))
    if vae_params:
        from ditsep_tpu.utils.checkpoint import load_params_npz
        params = {"params": load_params_npz(vae_params, params["params"])}
    return AutoencoderApp(vae=vae, params=params, fs=fs)


def main(argv=None):
    p = add_common_args(argparse.ArgumentParser(description=__doc__))
    p.add_argument("--params", default=None, help="npz score-model params")
    p.add_argument("--vae-config", default=None,
                   help="stable-audio JSON autoencoder config: adds the "
                        "autoencoder tab")
    p.add_argument("--vae-params", default=None)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7860)
    p.add_argument("--gradio", action="store_true",
                   help="launch the gradio widget shell instead of the "
                        "stdlib UI (needs the gradio package)")
    args = p.parse_args(argv)
    if args.cpu:
        from ditsep_tpu.cli.common import force_cpu
        force_cpu()
    cfg = load_config(args.config, args.override)

    separation = build_separation_app(cfg, args.params)
    autoencoder = (build_autoencoder_app(args.vae_config, args.vae_params)
                   if args.vae_config else None)

    if args.gradio:
        from ditsep_tpu.interface import create_ui
        create_ui(separation=separation, autoencoder=autoencoder,
                  fs=separation.fs).launch(server_name=args.host,
                                           server_port=args.port)
        return

    from ditsep_tpu.interface.web import DemoServer
    DemoServer(separation=separation, autoencoder=autoencoder,
               host=args.host, port=args.port).serve_forever()


if __name__ == "__main__":
    main()
