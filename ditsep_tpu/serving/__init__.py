"""Production serving: dynamic-batching inference over jitted samplers.

The reference ships only a demo UI (src/inference/run_gradio.py) — one
request at a time, one sampler call per request. On TPU that wastes the
chip: the 30-step PC sampler is a single compiled program whose cost is
nearly flat in batch size up to HBM limits (docs/batch_scaling.json), so
concurrent requests should ride ONE program invocation.

`BatchingEngine` implements that: requests queue on the host, a dispatch
thread groups them into static (bucket_length, batch_size) shapes — the
same frame-block bucketing as the eval harness, so padding never changes
an utterance's quiet fraction (docs/pad_dilution_r03.md) — and each group
runs as one jitted sampler call. `SeparationAPIServer` exposes it over a
dependency-free HTTP JSON/WAV API.
"""
from ditsep_tpu.serving.engine import (BatchingEngine,
                                       frame_block_padded_len)
from ditsep_tpu.serving.api import SeparationAPIServer
from ditsep_tpu.serving.streaming import (StreamingSeparator,
                                          engine_separate_fn)

__all__ = ["BatchingEngine", "SeparationAPIServer",
           "StreamingSeparator", "engine_separate_fn",
           "frame_block_padded_len"]
