"""Semantic (self-supervised speech representation) reconstruction loss.

TPU-native counterpart of the reference's HuBERT feature loss
(reference: src/stable_audio_tools/training/losses/semantic.py:15-98
``HubertLoss``): compare decoded audio against the target in the feature
space of a frozen speech SSL encoder, with per-layer std-normalised L1.

The encoder is a HOST-side frozen torch model (same gating pattern as the
T5/CLAP conditioners, ditsep_tpu/models/conditioners.py): torchaudio
pipelines need a weight download, so construction is gated and the loss
degrades to an explicit error message when the bundle is unavailable.
Because the encoder is frozen and host-side, the loss is computed on
detached audio and used for MONITORING or decoder-only finetune phases
where the gradient path is not required in-graph; the reference uses it
the same way inside the autoencoder trainer's loss mix.

``semantic_feature_l1`` is the pure-numpy/jnp core (layer features in ->
loss out); it is fully tested without torch weights.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

_BUNDLES = {
    "HUBERT_LARGE": "HUBERT_LARGE",
    "WAVLM_LARGE": "WAVLM_LARGE",
    "WAV2VEC2_LARGE_LV60K": "WAV2VEC2_LARGE_LV60K",
}


def semantic_feature_l1(feats_x: Sequence, feats_y: Sequence,
                        feature_ids: Optional[List[int]] = None,
                        weight: float = 1.0, eps: float = 1e-5):
    """Per-layer std-normalised L1 over selected feature layers
    (reference: semantic.py:69-80). Accepts numpy or jnp arrays."""
    loss = 0.0
    denom = 0
    for i, (fx, fy) in enumerate(zip(feats_x, feats_y)):
        if feature_ids is not None and i not in feature_ids:
            continue
        fx = jnp.asarray(fx)
        fy = jnp.asarray(fy)
        loss = loss + jnp.mean(jnp.abs(fx - fy)) / (jnp.std(fy) + eps)
        denom += 1
    if denom == 0:
        raise ValueError("no feature layers selected")
    return weight * loss / denom


class HubertLoss:
    """Frozen speech-SSL feature loss (reference: semantic.py:15-98).

    feature_ids=None compares every transformer layer; feature_ids=[-1]
    compares the conv feature extractor output only (the reference's
    conv_features mode).
    """

    def __init__(self, feature_ids: Optional[List[int]] = None,
                 weight: float = 1.0,
                 model_name: str = "HUBERT_LARGE"):
        if model_name not in _BUNDLES:
            raise ValueError(f"Unsupported model_name: {model_name}")
        self.feature_ids = feature_ids
        self.weight = weight
        self.model_name = model_name
        self._model = None

    def _load(self):
        if self._model is None:
            import torchaudio
            bundle = getattr(torchaudio.pipelines, _BUNDLES[self.model_name])
            self._model = bundle.get_model().eval()
            for p in self._model.parameters():
                p.requires_grad_(False)
        return self._model

    @property
    def available(self) -> bool:
        try:
            self._load()
            return True
        except Exception:
            return False

    def _features(self, wav: np.ndarray) -> List:
        import torch
        model = self._load()
        x = torch.from_numpy(np.asarray(wav, np.float32).reshape(
            -1, wav.shape[-1]))
        conv_only = (self.feature_ids is not None
                     and list(self.feature_ids) == [-1])
        with torch.no_grad():
            if conv_only:
                feats, _ = model.model.feature_extractor(x, None)
                return [feats.numpy()]
            feats, _ = model.extract_features(x)
            return [f.numpy() for f in feats]

    def __call__(self, x: np.ndarray, y: np.ndarray) -> float:
        """x, y: (B, C, T) or (B, T) waveforms at 16 kHz (the bundles'
        native rate; resample beforehand if needed)."""
        fx = self._features(x)
        fy = self._features(y)
        ids = None if (self.feature_ids is not None
                       and list(self.feature_ids) == [-1]) \
            else self.feature_ids
        return float(semantic_feature_l1(fx, fy, ids, self.weight))
