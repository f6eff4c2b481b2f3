"""JSON model-config factory: the stable-audio-tools config surface.

Re-design of the reference factories
(reference: src/stable_audio_tools/models/factory.py:3-161,
autoencoders.py:782-905). Accepts the same JSON config schema the
reference ships (e.g. configs/model_configs/autoencoders/
oobleck_finetune.json) and builds our Flax modules, so users can carry
their model configs over unchanged.
"""
from __future__ import annotations

import json
from typing import Any, Dict

from ditsep_tpu.models.bottleneck import (
    FSQBottleneck, L2Bottleneck, ResidualVQ, RVQBottleneck, TanhBottleneck,
    VAEBottleneck, WassersteinBottleneck,
)
from ditsep_tpu.models.dit import DiffusionTransformer
from ditsep_tpu.models.oobleck import OobleckVAE


def create_bottleneck_from_config(cfg: Dict[str, Any]):
    """(reference: factory.py create_bottleneck_from_config)."""
    kind = cfg["type"]
    c = cfg.get("config", {})
    if kind == "vae":
        return VAEBottleneck()
    if kind == "tanh":
        return TanhBottleneck(**c)
    if kind == "wasserstein":
        return WassersteinBottleneck(**c)
    if kind == "l2_norm":
        return L2Bottleneck()
    if kind == "rvq":
        q = ResidualVQ(dim=c.get("dim", 64),
                       codebook_size=c.get("codebook_size", 1024),
                       num_quantizers=c.get("num_quantizers", 4))
        return RVQBottleneck(q)
    if kind == "fsq":
        return FSQBottleneck(levels=tuple(c.get("levels", (8, 5, 5, 5))))
    if kind in ("dac_rvq", "dac_rvq_vae"):
        # (reference: factory.py:116-151)
        from ditsep_tpu.models.bottleneck import (
            DACResidualVQ, DACRVQBottleneck, DACRVQVAEBottleneck)
        q = DACResidualVQ(
            input_dim=c.get("input_dim", c.get("dim", 64)),
            n_codebooks=c.get("n_codebooks", 9),
            codebook_size=c.get("codebook_size", 1024),
            codebook_dim=c.get("codebook_dim", 8))
        if kind == "dac_rvq":
            return DACRVQBottleneck(
                q, quantize_on_decode=c.get("quantize_on_decode", False),
                noise_augment_dim=c.get("noise_augment_dim", 0))
        return DACRVQVAEBottleneck(
            q, quantize_on_decode=c.get("quantize_on_decode", False))
    raise NotImplementedError(f"Unknown bottleneck type: {kind}")


def create_autoencoder_from_config(cfg: Dict[str, Any]) -> OobleckVAE:
    """Build an OobleckVAE from the reference autoencoder JSON schema
    (reference: autoencoders.py:866-905). Only the oobleck encoder/decoder
    pair with a VAE bottleneck maps to a single fused module; other
    combinations raise for now."""
    model = cfg["model"]
    enc = model["encoder"]
    dec = model["decoder"]
    assert enc["type"] == "oobleck" and dec["type"] == "oobleck", (
        "only oobleck encoder/decoder configs are supported")
    bn = model.get("bottleneck", {"type": "vae"})
    assert bn["type"] == "vae", "AudioAutoencoder maps to OobleckVAE (vae)"
    e = enc["config"]
    d = dec["config"]
    return OobleckVAE(
        in_channels=e.get("in_channels", 1),
        out_channels=d.get("out_channels", 1),
        channels=e.get("channels", 128),
        latent_dim=model.get("latent_dim", d.get("latent_dim", 64)),
        c_mults=tuple(e.get("c_mults", (1, 2, 4, 8, 16))),
        strides=tuple(e.get("strides", (2, 4, 4, 8, 8))),
        use_snake=e.get("use_snake", False),
    )


def create_diffusion_cond_from_config(cfg: Dict[str, Any]):
    """Build a conditional DiT + routing from the reference diffusion_cond
    JSON schema (reference: models/diffusion.py
    create_diffusion_cond_from_config). Returns
    (DiffusionTransformer, CondRouting, conditioner_configs)."""
    from ditsep_tpu.training.diffusion import CondRouting

    model = cfg["model"]
    diff = model["diffusion"]
    dit_cfg = diff.get("config", {})
    diff_type = diff.get("type", "dit")
    if diff_type in ("adp_cfg_1d", "adp_1d"):
        # audio-diffusion-pytorch UNet family (reference:
        # models/diffusion.py:645-648 UNetCFG1DWrapper/UNet1DCondWrapper)
        from ditsep_tpu.models.unet1d import create_unet_from_config
        dit = create_unet_from_config(diff_type, dit_cfg)
    else:
        dit = DiffusionTransformer(
            io_channels=diff.get("io_channels",
                                 model.get("io_channels", 64)),
            embed_dim=dit_cfg.get("embed_dim", 768),
            depth=dit_cfg.get("depth", 12),
            num_heads=dit_cfg.get("num_heads", 8),
            cond_token_dim=dit_cfg.get("cond_token_dim", 0),
            global_cond_dim=dit_cfg.get("global_cond_dim", 0),
            project_cond_tokens=dit_cfg.get("project_cond_tokens", True),
            diffusion_objective=diff.get("diffusion_objective", "v"),
        )
    routing = CondRouting(
        cross_attn_cond_ids=tuple(diff.get("cross_attention_cond_ids", ())),
        global_cond_ids=tuple(diff.get("global_cond_ids", ())),
        input_concat_ids=tuple(diff.get("input_concat_ids", ())),
        prepend_cond_ids=tuple(diff.get("prepend_cond_ids", ())),
    )
    cond_cfgs = model.get("conditioning", {}).get("configs", [])
    return dit, routing, cond_cfgs


def create_model_from_config(cfg: Dict[str, Any]):
    """Top-level dispatch (reference: factory.py:3-24)."""
    model_type = cfg.get("model_type")
    assert model_type is not None, "model_type must be specified"
    if model_type == "autoencoder":
        return create_autoencoder_from_config(cfg)
    if model_type in ("diffusion_cond", "diffusion_cond_inpaint",
                      "diffusion_prior"):
        return create_diffusion_cond_from_config(cfg)
    if model_type == "diffusion_uncond":
        return create_diffusion_cond_from_config(cfg)[0]
    raise NotImplementedError(f"Unknown model type: {model_type}")


def create_model_from_config_path(path: str):
    with open(path) as f:
        return create_model_from_config(json.load(f))
