"""Gradio demo UI for separation and codec round-trips.

Re-design of the reference's gradio interface
(reference: src/inference/run_gradio.py:7-32 and
src/stable_audio_tools/interface/gradio.py:30-425). Gated on the optional
`gradio` package (not in the TPU image); the builders mirror the
reference's tab structure (separation / autoencoder).
"""
from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def create_ui(separate_fn: Optional[Callable] = None,
              codec_roundtrip_fn: Optional[Callable] = None,
              fs: int = 8000):
    """Build the demo UI.

    Args:
      separate_fn: (mix (1, 1, T) float32) -> (n_src, T) separated sources.
      codec_roundtrip_fn: (audio (1, 1, T)) -> (1, T) reconstruction.
    Returns a gradio.Blocks; call `.launch()` on it.
    """
    try:
        import gradio as gr
    except ImportError as e:
        raise ImportError(
            "gradio is not installed in this image; `pip install gradio` "
            "in a serving environment to use the demo UI") from e

    def _sep(audio):
        sr, wav = audio
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=1)
        wav = wav / max(np.abs(wav).max(), 1e-6)
        est = separate_fn(wav[None, None, :])
        return [(fs, np.asarray(e)) for e in est]

    def _codec(audio):
        sr, wav = audio
        wav = np.asarray(wav, np.float32)
        if wav.ndim == 2:
            wav = wav.mean(axis=1)
        rec = codec_roundtrip_fn(wav[None, None, :])
        return (fs, np.asarray(rec).reshape(-1))

    with gr.Blocks(title="ditsep_tpu") as ui:
        gr.Markdown("# ditsep_tpu — diffusion source separation (TPU)")
        if separate_fn is not None:
            with gr.Tab("Separate"):
                inp = gr.Audio(label="mixture")
                btn = gr.Button("Separate")
                outs = [gr.Audio(label=f"source {i}") for i in range(2)]
                btn.click(_sep, inputs=inp, outputs=outs)
        if codec_roundtrip_fn is not None:
            with gr.Tab("Autoencoder"):
                inp2 = gr.Audio(label="input")
                btn2 = gr.Button("Reconstruct")
                out2 = gr.Audio(label="reconstruction")
                btn2.click(_codec, inputs=inp2, outputs=out2)
    return ui
