"""Pretrained-checkpoint download helpers.

Re-design of the reference's checkpoint-fetch scripts (reference:
src/inference/separate.py:36-80 downloads fakufaku/diffsep from the HF
hub; scripts/get_diffsep_ckpt.py, get_vae_start.py). Gated on the
optional huggingface_hub package; the downloaded torch checkpoints feed
the importers in ditsep_tpu.models.torch_import.
"""
from __future__ import annotations

from typing import Optional


def download_checkpoint(repo_id: str = "fakufaku/diffsep",
                        filename: str = "checkpoints/"
                                        "epoch-029_si_sdr-14.804.ckpt",
                        cache_dir: Optional[str] = None) -> str:
    """Fetch a checkpoint file from the Hugging Face hub; returns the
    local path. Requires `huggingface_hub` (not in the TPU image)."""
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as e:
        raise ImportError(
            "huggingface_hub is not installed; download the checkpoint "
            "manually and point the importer at the file") from e
    return hf_hub_download(repo_id=repo_id, filename=filename,
                           cache_dir=cache_dir)


def load_reference_diffsep_params(model, ckpt_path: str,
                                  use_ema: bool = False):
    """Load the reference's shipped DiffSep checkpoint into our Flax score
    model (bit-parity path): torch state_dict -> importer.

    Returns the flax params tree for `model` (a ScoreModelNCSNpp).
    """
    import jax
    import jax.numpy as jnp

    from ditsep_tpu.models.torch_import import (
        import_params, load_torch_ckpt)

    state = load_torch_ckpt(ckpt_path)
    # reference keys are 'score_model.backbone.all_modules...'
    key = jax.random.PRNGKey(0)
    xt = jnp.zeros((1, 2, 16384))
    mix = jnp.zeros((1, 1, 16384))
    template = model.init(key, xt, jnp.ones((1,)), mix)
    params = import_params(template["params"], state,
                           prefix="score_model.")
    if use_ema and "ema" in state:
        raise NotImplementedError(
            "EMA import needs the torch parameters() ordering; use "
            "models.torch_import.import_ema_params directly")
    return {"params": params}
