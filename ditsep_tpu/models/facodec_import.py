"""Torch-checkpoint importers for FACodec (NaturalSpeech3).

Maps the reference torch state_dicts (reference:
src/models/facodec/facodec.py FACodecEncoder/FACodecDecoder, weight-norm
parameterization ``weight_v``/``weight_g``) onto the flax param trees of
:mod:`ditsep_tpu.models.facodec`. Validated end-to-end by the numerical
parity oracle in ``tests/test_facodec_parity.py``.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

__all__ = ["import_facodec_encoder", "import_facodec_decoder"]


def _np(sd: Dict[str, Any], key: str) -> np.ndarray:
    arr = sd[key]
    if hasattr(arr, "detach"):
        arr = arr.detach().cpu().numpy()
    return np.asarray(arr, np.float32)


def _wn_conv(sd, pt: str) -> Dict[str, np.ndarray]:
    """weight-norm Conv1d: torch v (out, in, k), g (out, 1, 1) ->
    flax v (k, in, out), g (out,)."""
    out = {"v": _np(sd, f"{pt}.weight_v").transpose(2, 1, 0),
           "g": _np(sd, f"{pt}.weight_g").reshape(-1)}
    if f"{pt}.bias" in sd:
        out["bias"] = _np(sd, f"{pt}.bias")
    return out


# weight-norm ConvTranspose1d: torch v (in, out, k), g (in, 1, 1) ->
# flax v (k, out, in), g (in,) -- the same axis moves as _wn_conv
# applied to the transposed-orientation layout
_wn_conv_t = _wn_conv


def _wn_dense(sd, pt: str) -> Dict[str, np.ndarray]:
    """weight-norm Linear: torch v (out, in), g (out, 1) ->
    flax v (in, out), g (out,)."""
    out = {"v": _np(sd, f"{pt}.weight_v").T,
           "g": _np(sd, f"{pt}.weight_g").reshape(-1)}
    if f"{pt}.bias" in sd:
        out["bias"] = _np(sd, f"{pt}.bias")
    return out


def _dense(sd, pt: str) -> Dict[str, np.ndarray]:
    return {"kernel": _np(sd, f"{pt}.weight").T,
            "bias": _np(sd, f"{pt}.bias")}


def _snake(sd, pt: str) -> Dict[str, Any]:
    """Activation1d wraps SnakeBeta as .act (reference:
    alias_free_torch/act.py:20); the FIR buffers are deterministic."""
    return {"snake": {"alpha": _np(sd, f"{pt}.act.alpha"),
                      "beta": _np(sd, f"{pt}.act.beta")}}


def _res_unit(sd, pt: str) -> Dict[str, Any]:
    """ResidualUnit.block = [act, conv7, act, conv1]
    (reference: facodec.py:123-136)."""
    return {"act_0": _snake(sd, f"{pt}.block.0"),
            "conv_0": _wn_conv(sd, f"{pt}.block.1"),
            "act_1": _snake(sd, f"{pt}.block.2"),
            "conv_1": _wn_conv(sd, f"{pt}.block.3")}


def import_facodec_encoder(state_dict) -> Dict[str, Any]:
    """FACodecEncoder state_dict -> flax params for
    :class:`ditsep_tpu.models.facodec.FACodecEncoder`.

    Torch layout (reference facodec.py:159-186): block.0 stem conv;
    block.{1..n} EncoderBlock(.block = [res, res, res, act, down]);
    block.{n+1} final act; block.{n+2} head conv."""
    sd = state_dict
    n_blocks = len({int(k.split(".")[1]) for k in sd
                    if k.startswith("block.")}) - 3
    params: Dict[str, Any] = {"stem": _wn_conv(sd, "block.0")}
    for i in range(n_blocks):
        pt = f"block.{i + 1}.block"
        params[f"block_{i}"] = {
            **{f"res_{j}": _res_unit(sd, f"{pt}.{j}") for j in range(3)},
            "act": _snake(sd, f"{pt}.3"),
            "down": _wn_conv(sd, f"{pt}.4"),
        }
    params["act"] = _snake(sd, f"block.{n_blocks + 1}")
    params["head"] = _wn_conv(sd, f"block.{n_blocks + 2}")
    return {"params": params}


def _fvq(sd, pt: str) -> Dict[str, Any]:
    return {"proj_in": _wn_dense(sd, f"{pt}.in_proj"),
            "proj_out": _wn_dense(sd, f"{pt}.out_proj"),
            "codebook": _np(sd, f"{pt}._codebook.weight")}


def _rvq(sd, pt: str, n: int) -> Dict[str, Any]:
    return {f"vq_{j}": _fvq(sd, f"{pt}.layers.{j}") for j in range(n)}


def _timbre_encoder(sd, pt: str, n_layers: int) -> Dict[str, Any]:
    """TransformerEncoder (reference transformer.py:154-234). The
    positional table ``position_emb.pe`` is a deterministic buffer
    (recomputed in flax); attention uses torch MultiheadAttention's
    fused in_proj (q|k|v stacked along dim 0)."""
    def _ln(p):
        return {"scale": _np(sd, f"{p}.weight"),
                "bias": _np(sd, f"{p}.bias")}

    out: Dict[str, Any] = {}
    for i in range(n_layers):
        lp = f"{pt}.layers.{i}"
        out[f"ln1_{i}"] = _ln(f"{lp}.ln_1")
        out[f"qkv_{i}"] = {
            "kernel": _np(sd, f"{lp}.self_attn.in_proj_weight").T,
            "bias": _np(sd, f"{lp}.self_attn.in_proj_bias")}
        out[f"out_{i}"] = _dense(sd, f"{lp}.self_attn.out_proj")
        out[f"ln2_{i}"] = _ln(f"{lp}.ln_2")
        # conv FFN: torch conv1d weight (filter, d, k) -> (k, d, filter)
        out[f"ffn1_{i}"] = {
            "kernel": _np(sd, f"{lp}.ffn.ffn_1.weight").transpose(2, 1, 0),
            "bias": _np(sd, f"{lp}.ffn.ffn_1.bias")}
        out[f"ffn2_{i}"] = _dense(sd, f"{lp}.ffn.ffn_2")
    out["ln_out"] = _ln(f"{pt}.last_ln")
    return out


def _cnnlstm_head(sd, pt: str, n_heads: int) -> Dict[str, Any]:
    """CNNLSTM (reference facodec.py:37-57): model = [res x3 (dilations
    1,2,3), act, rearrange]; heads.{i} linear."""
    out = {f"res_{i}": _res_unit(sd, f"{pt}.model.{i}") for i in range(3)}
    out["act"] = _snake(sd, f"{pt}.model.3")
    for i in range(n_heads):
        out[f"head_{i}"] = _dense(sd, f"{pt}.heads.{i}")
    return out


def import_facodec_decoder(state_dict, model) -> Dict[str, Any]:
    """FACodecDecoder state_dict -> flax params for
    :class:`ditsep_tpu.models.facodec.FACodecDecoder` (``model`` supplies
    the static config: up_ratios, quantizer counts, GR-head flags).

    Torch layout (reference facodec.py:244-412): quantizer.{0,1,2}
    ResidualVQ groups; model.0 stem; model.{1..n} DecoderBlock(.block =
    [act, up-conv, res, res, res]); model.{n+1} act; model.{n+2} head;
    timbre_encoder / timbre_linear; f0_predictor / phone_predictor and
    optional gradient-reversal predictors (nn.Sequential(GR, CNNLSTM),
    so the CNNLSTM sits at index 1)."""
    sd = state_dict
    params: Dict[str, Any] = {
        "q_prosody": _rvq(sd, "quantizer.0", model.vq_num_q_p),
        "q_content": _rvq(sd, "quantizer.1", model.vq_num_q_c),
        "timbre_encoder": _timbre_encoder(sd, "timbre_encoder",
                                          model.timbre_layers),
        "timbre_film": _dense(sd, "timbre_linear"),
        "f0_head": _cnnlstm_head(sd, "f0_predictor", 2),
        "phone_head": _cnnlstm_head(sd, "phone_predictor", 1),
        "dec_stem": _wn_conv(sd, "model.0"),
    }
    if model.vq_num_q_r > 0:
        params["q_residual"] = _rvq(sd, "quantizer.2", model.vq_num_q_r)
    n_up = len(model.up_ratios)
    for i in range(n_up):
        pt = f"model.{i + 1}.block"
        params[f"dec_block_{i}"] = {
            "act": _snake(sd, f"{pt}.0"),
            "up": _wn_conv_t(sd, f"{pt}.1"),
            **{f"res_{j}": _res_unit(sd, f"{pt}.{2 + j}")
               for j in range(3)},
        }
    params["dec_act"] = _snake(sd, f"model.{n_up + 1}")
    params["dec_head"] = _wn_conv(sd, f"model.{n_up + 2}")
    if model.use_gr_prosody_phone:
        params["prosody_phone_head"] = _cnnlstm_head(
            sd, "prosody_phone_predictor.1", 1)
    if model.use_gr_content_f0:
        params["content_f0_head"] = _cnnlstm_head(
            sd, "content_f0_predictor.1", 2)
    if model.vq_num_q_r > 0 and model.use_gr_residual_f0:
        params["res_f0_head"] = _cnnlstm_head(sd, "res_f0_predictor.1", 2)
    if model.vq_num_q_r > 0 and model.use_gr_residual_phone:
        params["res_phone_head"] = _cnnlstm_head(
            sd, "res_phone_predictor.1", 1)
    if model.use_gr_x_timbre:
        params["x_timbre_head"] = _cnnlstm_head(
            sd, "x_timbre_predictor.1", 1)
    return {"params": params}
