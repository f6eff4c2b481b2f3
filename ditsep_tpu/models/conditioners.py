"""Conditioning encoders for conditional diffusion.

TPU-native re-design of the stable-audio-tools conditioner stack
(reference: src/stable_audio_tools/models/conditioners.py:19-726). The
shipped ditsep configs use only NumberConditioner (seconds_start/
seconds_total); the text/audio conditioners are provided for parity, with
heavyweight pretrained encoders (T5) gated on the optional `transformers`
package and run on host.

Conditioner contract: ``apply -> (embedding (B, S, D), mask (B, S))``.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class TimePositionalEmbedding(nn.Module):
    """Sinusoidal positional embedding + projection
    (reference: adp.py TimePositionalEmbedding / NumberEmbedder:1455-1474).
    """

    dim: int = 256
    out_features: int = 768

    @nn.compact
    def __call__(self, x: Array) -> Array:
        half = self.dim // 2
        freqs = jnp.exp(-math.log(10000.0)
                        * jnp.arange(half) / half)
        ang = x[..., None] * freqs
        emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        return nn.Dense(self.out_features, name="to_out")(emb)


class NumberConditioner(nn.Module):
    """Scalar conditioner: clamp + normalize + sinusoidal embed
    (reference: conditioners.py:59-92; used by the ditsep stable-audio
    config for seconds_start/seconds_total)."""

    output_dim: int
    min_val: float = 0.0
    max_val: float = 1.0

    @nn.compact
    def __call__(self, floats: Array) -> Tuple[Array, Array]:
        x = jnp.clip(jnp.asarray(floats, jnp.float32), self.min_val,
                     self.max_val)
        x = (x - self.min_val) / (self.max_val - self.min_val)
        emb = TimePositionalEmbedding(
            dim=256, out_features=self.output_dim, name="embedder")(x)
        emb = emb[:, None, :]  # (B, 1, D)
        return emb, jnp.ones(emb.shape[:2], bool)


class IntConditioner(nn.Module):
    """Integer LUT conditioner (reference: conditioners.py:36-57)."""

    output_dim: int
    min_val: int = 0
    max_val: int = 512

    @nn.compact
    def __call__(self, ints: Array) -> Tuple[Array, Array]:
        n = self.max_val - self.min_val + 1
        idx = jnp.clip(jnp.asarray(ints, jnp.int32), self.min_val,
                       self.max_val) - self.min_val
        emb = nn.Embed(n, self.output_dim, name="int_embedder")(idx)
        emb = emb[:, None, :]
        return emb, jnp.ones(emb.shape[:2], bool)


class ListConditioner(nn.Module):
    """Categorical-string LUT conditioner
    (reference: conditioners.py:94-120). Call with integer indices into
    `options` (string lookup happens on host)."""

    output_dim: int
    options: Sequence[str] = ()

    @nn.compact
    def __call__(self, indices: Array) -> Tuple[Array, Array]:
        emb = nn.Embed(len(self.options), self.output_dim,
                       name="lut")(jnp.asarray(indices, jnp.int32))
        emb = emb[:, None, :]
        return emb, jnp.ones(emb.shape[:2], bool)


class PretransformConditioner(nn.Module):
    """Condition on pretransform (VAE) latents of reference audio
    (reference: conditioners.py PretransformConditioner): project latent
    channels to output_dim per frame."""

    output_dim: int

    @nn.compact
    def __call__(self, latents: Array) -> Tuple[Array, Array]:
        """latents: (B, D, T) -> ((B, T, out), mask)."""
        x = jnp.swapaxes(latents, 1, 2)
        emb = nn.Dense(self.output_dim, name="proj")(x)
        return emb, jnp.ones(emb.shape[:2], bool)


def clap_encode_host(texts=None, audio=None,
                     model_name: str = "laion/larger_clap_general"):
    """Host-side CLAP text/audio embeddings via the optional transformers
    package (reference: conditioners.py CLAPTextConditioner /
    CLAPAudioConditioner). Returns (embeddings (B, 1, D), mask)."""
    import numpy as np
    import torch
    from transformers import AutoProcessor, ClapModel

    model = ClapModel.from_pretrained(model_name).eval()
    proc = AutoProcessor.from_pretrained(model_name)
    with torch.no_grad():
        if texts is not None:
            inputs = proc(text=texts, return_tensors="pt", padding=True)
            emb = model.get_text_features(**inputs)
        else:
            inputs = proc(audios=list(audio), sampling_rate=48000,
                          return_tensors="pt")
            emb = model.get_audio_features(**inputs)
    emb = emb[:, None, :].numpy()
    return emb, np.ones(emb.shape[:2], bool)


def t5_encode_host(texts: List[str], model_name: str = "t5-base",
                   max_length: int = 128):
    """Host-side T5 text encoding via the optional `transformers` package
    (reference: conditioners.py T5Conditioner). Returns numpy
    (embeddings, mask) or raises ImportError."""
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    tok = AutoTokenizer.from_pretrained(model_name)
    enc = T5EncoderModel.from_pretrained(model_name).eval()
    batch = tok(texts, truncation=True, max_length=max_length,
                padding="max_length", return_tensors="pt")
    with torch.no_grad():
        out = enc(input_ids=batch["input_ids"],
                  attention_mask=batch["attention_mask"])
    return (out.last_hidden_state.numpy(),
            batch["attention_mask"].numpy().astype(bool))


class MultiConditioner:
    """Route a metadata dict through named conditioners
    (reference: conditioners.py:605-650). Functional: call with a dict of
    arrays keyed like the conditioner dict, plus each conditioner's
    variables."""

    def __init__(self, conditioners: Dict[str, nn.Module],
                 default_keys: Optional[Dict[str, str]] = None):
        self.conditioners = conditioners
        self.default_keys = default_keys or {}

    def init(self, key: Array, batch_inputs: Dict[str, Array]):
        variables = {}
        for name, cond in self.conditioners.items():
            src = name if name in batch_inputs else self.default_keys[name]
            variables[name] = cond.init(key, batch_inputs[src])
        return variables

    def __call__(self, variables, batch_inputs: Dict[str, Array]):
        out = {}
        for name, cond in self.conditioners.items():
            src = name if name in batch_inputs else self.default_keys[name]
            out[name] = cond.apply(variables[name], batch_inputs[src])
        return out
