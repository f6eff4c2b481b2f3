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


# ARPABET phoneme inventory (CMUdict): 39 phonemes, vowels with 0/1/2
# stress markers -- the same symbol set g2p_en exposes
# (reference: conditioners.py:369-430 PhonemeConditioner).
_ARPABET_BASE = [
    "AA", "AE", "AH", "AO", "AW", "AY", "B", "CH", "D", "DH", "EH", "ER",
    "EY", "F", "G", "HH", "IH", "IY", "JH", "K", "L", "M", "N", "NG",
    "OW", "OY", "P", "R", "S", "SH", "T", "TH", "UH", "UW", "V", "W",
    "Y", "Z", "ZH"]
_VOWELS = {"AA", "AE", "AH", "AO", "AW", "AY", "EH", "ER", "EY", "IH",
           "IY", "OW", "OY", "UH", "UW"}
ARPABET_PHONEMES = ["_"] + [
    p + s for p in _ARPABET_BASE
    for s in (("0", "1", "2") if p in _VOWELS else ("",))]
_P2IDX = {p: i for i, p in enumerate(ARPABET_PHONEMES)}

# minimal rule-based English grapheme->phoneme fallback (used when the
# g2p_en package is absent; the neural g2p is a lookup+LSTM over the same
# symbol set, so the conditioner contract is identical)
_G2P_RULES = [
    ("tion", ["SH", "AH0", "N"]), ("ough", ["AO1"]), ("ch", ["CH"]),
    ("sh", ["SH"]), ("th", ["TH"]), ("ph", ["F"]), ("wh", ["W"]),
    ("ng", ["NG"]), ("qu", ["K", "W"]), ("ck", ["K"]), ("ee", ["IY1"]),
    ("oo", ["UW1"]), ("ou", ["AW1"]), ("ai", ["EY1"]), ("ay", ["EY1"]),
    ("oi", ["OY1"]), ("ea", ["IY1"]),
    ("a", ["AE1"]), ("b", ["B"]), ("c", ["K"]), ("d", ["D"]),
    ("e", ["EH1"]), ("f", ["F"]), ("g", ["G"]), ("h", ["HH"]),
    ("i", ["IH1"]), ("j", ["JH"]), ("k", ["K"]), ("l", ["L"]),
    ("m", ["M"]), ("n", ["N"]), ("o", ["AA1"]), ("p", ["P"]),
    ("r", ["R"]), ("s", ["S"]), ("t", ["T"]), ("u", ["AH1"]),
    ("v", ["V"]), ("w", ["W"]), ("x", ["K", "S"]), ("y", ["Y"]),
    ("z", ["Z"])]


_G2P_SINGLETON = None


def text_to_phonemes(text: str) -> List[str]:
    """English text -> ARPABET phoneme list. Uses g2p_en when installed
    (the reference's encoder), else the rule-based fallback; spaces and
    punctuation become '_' like the reference's ignore list."""
    try:
        from g2p_en import G2p
        out = []
        import string as _string
        ignore = set(" " + _string.punctuation)
        global _G2P_SINGLETON
        if _G2P_SINGLETON is None:
            # G2p() reloads cmudict + its seq2seq weights on every
            # construction (~hundreds of ms) -- cache one instance
            _G2P_SINGLETON = G2p()
        for p in _G2P_SINGLETON(text):
            out.append("_" if p in ignore else p)
        return out
    except ImportError:
        pass
    out: List[str] = []
    for word in text.lower().split():
        i = 0
        w = "".join(ch for ch in word if ch.isalpha())
        while i < len(w):
            for pat, phones in _G2P_RULES:
                if w.startswith(pat, i):
                    out.extend(phones)
                    i += len(pat)
                    break
            else:
                i += 1
        out.append("_")
    return out[:-1] if out else []


def phonemes_to_ids(phonemes: List[str], max_length: int = 1024
                    ) -> List[int]:
    """Phoneme symbols -> LUT ids: 0 pad, 1 unknown, 2+ table
    (reference: conditioners.py:394-410)."""
    return [(_P2IDX[p] + 2 if p in _P2IDX else 1)
            for p in phonemes][:max_length]


class PhonemeConditioner(nn.Module):
    """Phoneme-LUT text conditioner (reference: conditioners.py:369-430).
    Host side converts text via ``text_to_phonemes`` + ``phonemes_to_ids``
    and pads to a static length; this module embeds the id grid."""

    output_dim: int
    max_length: int = 1024
    project_out: bool = False

    @nn.compact
    def __call__(self, phoneme_ids: Array) -> Tuple[Array, Array]:
        """phoneme_ids: (B, S) int, 0 = padding."""
        ids = jnp.asarray(phoneme_ids, jnp.int32)
        emb = nn.Embed(len(ARPABET_PHONEMES) + 2, self.output_dim,
                       name="phoneme_embedder")(ids)
        if self.project_out:
            emb = nn.Dense(self.output_dim, name="proj_out")(emb)
        return emb, ids != 0


def clap_encode_host(texts=None, audio=None,
                     model_name: str = "laion/larger_clap_general",
                     model=None, processor=None):
    """Host-side CLAP text/audio embeddings via the optional transformers
    package (reference: conditioners.py CLAPTextConditioner /
    CLAPAudioConditioner). Returns (embeddings (B, 1, D), mask).

    ``model``/``processor`` inject pre-built objects (e.g. a
    locally-cached or random-weight ``ClapModel`` in offline
    environments); by default both come from ``from_pretrained``."""
    import numpy as np
    import torch
    from transformers import AutoProcessor, ClapModel

    model = (model if model is not None
             else ClapModel.from_pretrained(model_name)).eval()
    proc = (processor if processor is not None
            else AutoProcessor.from_pretrained(model_name))
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
                   max_length: int = 128, tokenizer=None, encoder=None):
    """Host-side T5 text encoding via the optional `transformers` package
    (reference: conditioners.py T5Conditioner). Returns numpy
    (embeddings, mask) or raises ImportError.

    ``tokenizer``/``encoder`` inject pre-built objects (anything with the
    HF call contract), so offline environments can supply a local or
    random-weight encoder instead of downloading ``model_name``."""
    import torch
    from transformers import AutoTokenizer, T5EncoderModel

    tok = (tokenizer if tokenizer is not None
           else AutoTokenizer.from_pretrained(model_name))
    enc = (encoder if encoder is not None
           else T5EncoderModel.from_pretrained(model_name)).eval()
    batch = tok(texts, truncation=True, max_length=max_length,
                padding="max_length", return_tensors="pt")
    with torch.no_grad():
        out = enc(input_ids=batch["input_ids"],
                  attention_mask=batch["attention_mask"])
    return (out.last_hidden_state.numpy(),
            batch["attention_mask"].numpy().astype(bool))


class HostEmbeddingConditioner(nn.Module):
    """Projection head over embeddings computed by a HOST encoder
    (T5/CLAP via `t5_encode_host`/`clap_encode_host`): the learned
    out-projection the reference attaches to its pretrained conditioners
    (reference: conditioners.py T5Conditioner proj_out). Call with the
    precomputed (B, S, D_enc) embeddings (S=1 for pooled CLAP)."""

    output_dim: int
    project_out: bool = True

    @nn.compact
    def __call__(self, embeddings: Array,
                 mask: Optional[Array] = None) -> Tuple[Array, Array]:
        emb = jnp.asarray(embeddings, jnp.float32)
        if emb.ndim == 2:
            emb = emb[:, None, :]
        if self.project_out or emb.shape[-1] != self.output_dim:
            emb = nn.Dense(self.output_dim, name="proj_out")(emb)
        if mask is not None:
            # the encoder's true attention mask (t5_encode_host returns
            # one) -- ALWAYS prefer it: T5 emits non-zero hidden states
            # at pad positions, so the all-zero-row heuristic below
            # would attend to padding
            return emb, jnp.asarray(mask).astype(bool)
        # fallback padding convention: all-zero embedding rows are padding
        hmask = jnp.any(embeddings != 0, axis=-1) if embeddings.ndim == 3 \
            else jnp.ones(emb.shape[:2], bool)
        return emb, hmask


def create_multi_conditioner_from_config(cond_config: Dict
                                         ) -> "MultiConditioner":
    """Build a MultiConditioner from the reference conditioning JSON
    schema (reference: conditioners.py:652-726
    create_multi_conditioner_from_conditioning_config): a `configs` list
    of {id, type, config} with a shared `cond_dim` default width."""
    cond_dim = cond_config.get("cond_dim", 768)
    conditioners: Dict[str, nn.Module] = {}
    for cfg in cond_config.get("configs", []):
        cid, kind = cfg["id"], cfg["type"]
        c = dict(cfg.get("config", {}))
        out_dim = c.pop("output_dim", cond_dim)
        if kind == "number":
            conditioners[cid] = NumberConditioner(
                out_dim, min_val=c.get("min_val", 0.0),
                max_val=c.get("max_val", 1.0))
        elif kind == "int":
            conditioners[cid] = IntConditioner(
                out_dim, min_val=c.get("min_val", 0),
                max_val=c.get("max_val", 512))
        elif kind == "list":
            conditioners[cid] = ListConditioner(
                out_dim, options=tuple(c.get("options", ())))
        elif kind == "phoneme":
            conditioners[cid] = PhonemeConditioner(
                out_dim, max_length=c.get("max_length", 1024),
                project_out=c.get("project_out", False))
        elif kind in ("t5", "clap_text", "clap_audio"):
            # encoder runs on host (t5_encode_host / clap_encode_host);
            # the module is the learned projection over its output
            conditioners[cid] = HostEmbeddingConditioner(
                out_dim, project_out=c.get("project_out", True))
        elif kind == "pretransform":
            conditioners[cid] = PretransformConditioner(out_dim)
        else:
            raise ValueError(f"unknown conditioner type {kind!r}")
    return MultiConditioner(conditioners,
                            cond_config.get("default_keys", {}))


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
        for i, (name, cond) in enumerate(self.conditioners.items()):
            src = name if name in batch_inputs else self.default_keys[name]
            # distinct key per conditioner: same-shaped conditioners
            # (e.g. seconds_start/seconds_total) must not start with
            # byte-identical weights
            val = batch_inputs[src]
            if isinstance(val, tuple) and len(val) == 2:
                val = val[0]  # (embeddings, mask) pairs init on emb
            variables[name] = cond.init(jax.random.fold_in(key, i), val)
        return variables

    def __call__(self, variables, batch_inputs: Dict[str, Array]):
        out = {}
        for name, cond in self.conditioners.items():
            src = name if name in batch_inputs else self.default_keys[name]
            val = batch_inputs[src]
            if isinstance(val, tuple) and len(val) == 2:
                # (embeddings, attention_mask) pairs — e.g. the tuple
                # t5_encode_host returns — forward the true mask
                out[name] = cond.apply(variables[name], val[0],
                                       mask=val[1])
            else:
                out[name] = cond.apply(variables[name], val)
        return out
