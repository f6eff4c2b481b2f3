"""Torch-checkpoint importer: reference PyTorch state_dicts -> Flax params.

The reference ships trained checkpoints (e.g. epoch-029_si_sdr-14.804.ckpt,
reference: src/evaluate_mp.py:403); this module maps their tensors onto our
Flax trees for bit-parity evaluation. Because our module/parameter naming
mirrors the torch names (all_modules_{i} <-> all_modules.{i}, Conv_0,
GroupNorm_1, NIN_3, ...), the conversion is a deterministic rename plus a
layout transpose (OIHW -> HWIO, Linear (out,in) -> (in,out)).

No torch import is required here: callers hand us a flat
``{torch_key: numpy array}`` mapping (use ``load_torch_ckpt`` when torch is
available).
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import numpy as np

Array = Any


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """Map a flax param path to the corresponding torch state_dict key.

    Returns None for paths that have no torch counterpart.
    """
    parts: List[str] = []
    for p in path[:-1]:
        # all_modules_12 -> all_modules.12
        if p.startswith("all_modules_"):
            idx = p[len("all_modules_"):]
            parts.extend(["all_modules", idx])
        else:
            parts.append(p)
    leaf = path[-1]
    leaf_map = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "W": "W", "b": "b"}
    if leaf not in leaf_map:
        return None
    parts.append(leaf_map[leaf])
    return ".".join(parts)


def _convert_leaf(torch_arr: np.ndarray, flax_leaf_name: str,
                  flax_shape: Tuple[int, ...]) -> np.ndarray:
    """Layout-convert a torch tensor to the flax layout."""
    a = np.asarray(torch_arr)
    if flax_leaf_name == "kernel":
        if a.ndim == 4:  # conv OIHW -> HWIO
            a = a.transpose(2, 3, 1, 0)
        elif a.ndim == 3:  # conv1d OIW -> WIO
            a = a.transpose(2, 1, 0)
        elif a.ndim == 2:  # linear (out, in) -> (in, out)
            a = a.transpose(1, 0)
    if tuple(a.shape) != tuple(flax_shape):
        raise ValueError(
            f"shape mismatch converting to flax leaf {flax_leaf_name}: "
            f"torch {torch_arr.shape} -> {a.shape}, flax wants {flax_shape}")
    return a


def import_params(
    flax_params: Mapping[str, Any],
    torch_state: Mapping[str, np.ndarray],
    prefix: str = "",
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax param tree with tensors from a torch state_dict.

    Args:
      flax_params: template tree (e.g. ``model.init(...)['params']``) giving
        structure, names and shapes.
      torch_state: flat mapping of torch keys to numpy arrays.
      prefix: prepended to every derived torch key (e.g.
        ``"score_model."`` for full DiffSep checkpoints).
      strict: raise if a derived key is missing from ``torch_state``.

    Returns a new tree with the same structure and imported values.
    """
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out: Dict[str, Any] = jax.tree_util.tree_map(lambda x: x, dict(flax_params))

    def path_names(keypath) -> Tuple[str, ...]:
        names = []
        for k in keypath:
            if hasattr(k, "key"):
                names.append(str(k.key))
            else:
                names.append(str(k))
        return tuple(names)

    # rebuild tree imperatively
    def set_in(tree, names, value):
        node = tree
        for n in names[:-1]:
            node = node[n]
        node[names[-1]] = value

    def to_mutable(tree):
        if isinstance(tree, Mapping):
            return {k: to_mutable(v) for k, v in tree.items()}
        return tree

    out = to_mutable(flax_params)

    missing = []
    for keypath, leaf in flat:
        names = path_names(keypath)
        tkey = flax_path_to_torch_key(names)
        if tkey is None:
            missing.append("/".join(names))
            continue
        tkey = prefix + tkey
        if tkey not in torch_state:
            if strict:
                raise KeyError(
                    f"torch key {tkey!r} (for flax {'/'.join(names)}) not in "
                    f"state dict; sample keys: "
                    f"{list(torch_state)[:5]}")
            missing.append(tkey)
            continue
        arr = _convert_leaf(torch_state[tkey], names[-1], leaf.shape)
        set_in(out, names, arr.astype(np.asarray(leaf).dtype))
    if missing and strict:
        raise KeyError(f"unmapped flax leaves: {missing}")
    return out


def import_ema_params(
    flax_params: Mapping[str, Any],
    shadow_params: List[np.ndarray],
    torch_param_order: List[str],
    prefix: str = "",
) -> Dict[str, Any]:
    """Map torch_ema's flat ``shadow_params`` list onto a flax tree.

    torch_ema stores EMA weights as a list in the order of
    ``model.parameters()`` (reference: src/diffsep.py:578-609 embeds it in
    checkpoints under ``ema``). ``torch_param_order`` is the list of torch
    state-dict keys in parameters() order (caller extracts it from the torch
    model or the checkpoint's state_dict key order restricted to
    requires-grad tensors).
    """
    state = {k: np.asarray(v) for k, v in
             zip(torch_param_order, shadow_params)}
    return import_params(flax_params, state, prefix=prefix, strict=True)


def oobleck_flax_path_to_torch_key(path: Tuple[str, ...],
                                   n_blocks: int = 5) -> Optional[str]:
    """Map an OobleckVAE flax param path to the stable-audio-tools torch
    state_dict key (reference: src/stable_audio_tools/models/
    autoencoders.py:285-356 nn.Sequential index layout).

    Weight-norm leaves: flax ``v``/``g`` map to torch ``weight_v``/
    ``weight_g`` (torch.nn.utils.weight_norm key names).
    """
    parts = list(path)
    leaf = parts.pop()
    leaf_map = {"v": "weight_v", "g": "weight_g", "bias": "bias",
                "alpha": "alpha", "beta": "beta"}
    if leaf not in leaf_map:
        return None

    def conv_in_res(res_local: str) -> str:
        # ResidualUnit.layers: 0=act 1=conv7 2=act 3=conv1
        return {"conv_0": "layers.1", "conv_1": "layers.3",
                "act_0": "layers.0.act", "act_1": "layers.2.act"}[res_local]

    out: list = []
    side = parts[0]  # 'encoder' or 'decoder'
    out.append(side)
    rest = parts[1:]
    if rest[0] == "stem":
        out.append("layers.0")
    elif rest[0] == "head":
        out.append(f"layers.{n_blocks + 2}")
    elif rest[0] == "act":
        # top-level snake activation before head
        out.append(f"layers.{n_blocks + 1}.act")
    elif rest[0].startswith("block_"):
        i = int(rest[0].split("_")[1])
        out.append(f"layers.{i + 1}")
        if side == "encoder":
            # EncoderBlock.layers: 0,1,2=res 3=act 4=down
            if rest[1].startswith("res_"):
                r = int(rest[1].split("_")[1])
                out.append(f"layers.{r}")
                out.append(conv_in_res(rest[2]))
            elif rest[1] == "down":
                out.append("layers.4")
            elif rest[1] == "act":
                out.append("layers.3.act")
        else:
            # DecoderBlock.layers: 0=act 1=up 2,3,4=res
            if rest[1] == "up":
                out.append("layers.1")
            elif rest[1].startswith("res_"):
                r = int(rest[1].split("_")[1])
                out.append(f"layers.{2 + r}")
                out.append(conv_in_res(rest[2]))
            elif rest[1] == "act":
                out.append("layers.0.act")
    else:
        return None
    out.append(leaf_map[leaf])
    return ".".join(out)


def _convert_oobleck_leaf(arr: np.ndarray, flax_leaf: str, is_transpose: bool,
                          flax_shape) -> np.ndarray:
    a = np.asarray(arr)
    if flax_leaf == "v":
        # torch conv (O,I,K) / conv-transpose (I,O,K) -> both (K, dim1, dim0)
        a = a.transpose(2, 1, 0)
    elif flax_leaf == "g":
        a = a.reshape(-1)
    if tuple(a.shape) != tuple(flax_shape):
        raise ValueError(
            f"oobleck shape mismatch: got {a.shape}, want {flax_shape}")
    return a


def import_oobleck_params(
    flax_params: Mapping[str, Any],
    torch_state: Mapping[str, np.ndarray],
    prefix: str = "",
    n_blocks: int = 5,
) -> Dict[str, Any]:
    """Fill an OobleckVAE flax tree from a stable-audio-tools checkpoint."""
    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]

    def to_mutable(tree):
        if isinstance(tree, Mapping):
            return {k: to_mutable(v) for k, v in tree.items()}
        return tree

    out = to_mutable(flax_params)
    for keypath, leaf in flat:
        names = tuple(str(getattr(k, "key", k)) for k in keypath)
        tkey = oobleck_flax_path_to_torch_key(names, n_blocks=n_blocks)
        if tkey is None:
            raise KeyError(f"unmapped oobleck flax leaf {'/'.join(names)}")
        tkey = prefix + tkey
        if tkey not in torch_state:
            raise KeyError(f"torch key {tkey!r} not found (flax "
                           f"{'/'.join(names)})")
        is_tr = names[-2] == "up" if len(names) >= 2 else False
        arr = _convert_oobleck_leaf(
            torch_state[tkey], names[-1], is_tr, leaf.shape)
        node = out
        for n in names[:-1]:
            node = node[n]
        node[names[-1]] = arr.astype(np.asarray(leaf).dtype)
    return out


def load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint/state_dict file into numpy (requires torch)."""
    import torch  # local import: torch is optional at runtime

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}


# Known non-trainable entries in the reference's NCSNpp state_dict:
# torch_ema's shadow list covers requires-grad parameters only, so these
# must be skipped when reconstructing parameters() order from state_dict
# key order (state_dict preserves registration order).
#   - 'sigmas': registered buffer (reference src/models/diffsep/
#     ncsnpp.py:104)
#   - GaussianFourierProjection 'W' at all_modules.0:
#     nn.Parameter(requires_grad=False) (reference src/models/diffsep/
#     ncsnpp_utils/layerspp.py:37-46). NOTE: NIN layers also expose a 'W'
#     leaf (layers.py NIN) but those ARE trainable -- only the Fourier
#     projection at module index 0 is frozen.
_NCSNPP_NON_TRAINABLE_SUFFIXES = ("sigmas", "all_modules.0.W")


def diffsep_ema_param_order(state_dict_keys) -> List[str]:
    """Reconstruct torch ``parameters()`` order (requires-grad only) from
    a DiffSep/NCSNpp checkpoint's state_dict key order.

    torch_ema stores ``shadow_params`` as a flat list over
    ``[p for p in parameters() if p.requires_grad]``; nn.Module state_dict
    iteration preserves the same registration order with buffers and
    frozen parameters interleaved, so filtering those reproduces the
    shadow order (reference: src/diffsep.py:578-609, torch_ema semantics).
    """
    return [k for k in state_dict_keys
            if not any(k.endswith(s) for s in
                       _NCSNPP_NON_TRAINABLE_SUFFIXES)]


def import_diffsep_ema(
    flax_params: Mapping[str, Any],
    ckpt: Mapping[str, Any],
    prefix: str = "score_model.backbone.",
) -> Dict[str, Any]:
    """Import the EMA weights embedded in a full DiffSep Lightning
    checkpoint (``ckpt['ema']['shadow_params']``, written by
    on_save_checkpoint, reference: src/diffsep.py:608-609) onto a flax
    score-model tree. ``ckpt`` is the loaded checkpoint object (pass
    ``torch.load(path, map_location='cpu')`` or an equivalent dict whose
    tensors expose ``.detach()`` or are numpy already).
    """
    def to_np(v):
        return v.detach().cpu().numpy() if hasattr(v, "detach") \
            else np.asarray(v)

    state = {k: to_np(v) for k, v in ckpt["state_dict"].items()}
    shadows = [to_np(v) for v in ckpt["ema"]["shadow_params"]]
    order = diffsep_ema_param_order(
        [k for k in state if k.startswith(prefix)])
    if len(order) != len(shadows):
        raise ValueError(
            f"EMA shadow list has {len(shadows)} tensors but the "
            f"checkpoint has {len(order)} trainable parameters under "
            f"{prefix!r}")
    # EMA covers trainable parameters only; frozen leaves (Fourier W) and
    # buffers keep their state_dict values (torch_ema copy_to semantics).
    ema_state = dict(zip(order, shadows))
    for k, v in state.items():
        ema_state.setdefault(k, v)
    return import_params(flax_params, ema_state, prefix=prefix,
                         strict=True)


# --------------------------------------------------------------------------
# DAU1d (dance-diffusion DiffusionAttnUnet1D) importer
# --------------------------------------------------------------------------
def import_dau1d_params(state_dict, depth: int, n_attn_layers: int):
    """Map a reference DiffusionAttnUnet1D state_dict onto our
    models.dau1d param tree (reference: models/diffusion.py:391-505; the
    Sequential/SkipBlock nesting indices mirror the build loop exactly:
    SkipBlock.main = [down, conv, attn, conv, attn, conv, attn, inner,
    conv, attn, conv, attn, conv, attn, up]). FIR resampling carries no
    parameters; learned resampling (down/up convs) is imported when
    present."""
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def conv_kernel(arr):  # torch (out, in, k) -> flax (k, in, out)
        return np.transpose(arr, (2, 1, 0))

    def res_conv(pt):
        out = {
            "conv1": {"kernel": conv_kernel(sd[f"{pt}.main.0.weight"])},
            "norm1": {"scale": sd[f"{pt}.main.1.weight"],
                      "bias": sd[f"{pt}.main.1.bias"]},
            "conv2": {"kernel": conv_kernel(sd[f"{pt}.main.3.weight"])},
        }
        if f"{pt}.main.0.bias" in sd:
            out["conv1"]["bias"] = sd[f"{pt}.main.0.bias"]
            out["conv2"]["bias"] = sd[f"{pt}.main.3.bias"]
        if f"{pt}.main.4.weight" in sd:  # absent on is_last blocks
            out["norm2"] = {"scale": sd[f"{pt}.main.4.weight"],
                            "bias": sd[f"{pt}.main.4.bias"]}
        if f"{pt}.skip.weight" in sd:
            out["skip"] = {"kernel": conv_kernel(sd[f"{pt}.skip.weight"])}
        return out

    def attn(pt):
        return {
            "norm": {"scale": sd[f"{pt}.norm.weight"],
                     "bias": sd[f"{pt}.norm.bias"]},
            "qkv_proj": {"kernel": conv_kernel(sd[f"{pt}.qkv_proj.weight"]),
                         "bias": sd[f"{pt}.qkv_proj.bias"]},
            "out_proj": {"kernel": conv_kernel(sd[f"{pt}.out_proj.weight"]),
                         "bias": sd[f"{pt}.out_proj.bias"]},
        }

    attn_layer = (depth - n_attn_layers if n_attn_layers > 0
                  else depth + 1)

    def level(pt, i):
        m = f"{pt}.main"
        out = {}
        for name, idx in (("pre0", 1), ("pre1", 3), ("pre2", 5),
                          ("post0", 8), ("post1", 10), ("post2", 12)):
            out[name] = res_conv(f"{m}.{idx}")
        if i >= attn_layer:
            for name, idx in (("attn0", 2), ("attn1", 4), ("attn2", 6),
                              ("attn3", 9), ("attn4", 11), ("attn5", 13)):
                out[name] = attn(f"{m}.{idx}")
        if f"{m}.0.weight" in sd:  # learned downsample
            out["down"] = {"kernel": conv_kernel(sd[f"{m}.0.weight"]),
                           "bias": sd[f"{m}.0.bias"]}
        if f"{m}.14.weight" in sd:  # learned upsample
            out["up"] = {"kernel": conv_kernel(sd[f"{m}.14.weight"]),
                         "bias": sd[f"{m}.14.bias"]}
        if i < depth:
            out["inner"] = level(f"{m}.7", i + 1)
        return out

    params = {
        "timestep_embed": sd["timestep_embed.weight"],
        "stem0": res_conv("net.0"),
        "stem1": res_conv("net.1"),
        "stem2": res_conv("net.2"),
        "head0": res_conv("net.4"),
        "head1": res_conv("net.5"),
        "head2": res_conv("net.6"),
    }
    if depth > 1:
        params["inner"] = level("net.3", 2)
    return {"params": params}


# --------------------------------------------------------------------------
# DiT (stable-audio DiffusionTransformer, continuous_transformer) importer
# --------------------------------------------------------------------------
def import_dit_params(state_dict, depth: int):
    """Map a reference DiffusionTransformer state_dict (reference:
    src/stable_audio_tools/models/dit.py:12-180 with
    transformer_type='continuous_transformer', src/stable_audio_tools/
    models/transformer.py:637-899) onto our models.dit param tree.

    Covers the optional submodules by key presence: to_cond_embed /
    to_global_embed / to_prepend_embed MLPs, the adaLN global_cond_embedder
    (-> transformer/global_embed_{in,out}), per-layer cross-attention,
    to_scale_shift_gate, and qk layernorms. The reference LayerNorm keeps
    beta as a zero buffer (transformer.py:177-198); it maps onto our flax
    LayerNorm bias directly.
    """
    import numpy as np

    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def lin(k):  # torch Linear (out, in) -> flax kernel (in, out)
        return sd[k].T

    def conv1(k):  # torch Conv1d (out, in, 1) -> flax (1, in, out)
        return np.transpose(sd[k], (2, 1, 0))

    def mlp(pt, bias):
        out = {"dense_0": {"kernel": lin(f"{pt}.0.weight")},
               "dense_1": {"kernel": lin(f"{pt}.2.weight")}}
        if bias:
            out["dense_0"]["bias"] = sd[f"{pt}.0.bias"]
            out["dense_1"]["bias"] = sd[f"{pt}.2.bias"]
        return out

    def norm(pt):
        g = sd[f"{pt}.gamma"]
        return {"scale": g, "bias": sd.get(f"{pt}.beta", np.zeros_like(g))}

    p = {
        "timestep_features": {"weight": sd["timestep_features.weight"]},
        "to_timestep_embed": mlp("to_timestep_embed", True),
        "preprocess_conv": {"kernel": conv1("preprocess_conv.weight")},
        "postprocess_conv": {"kernel": conv1("postprocess_conv.weight")},
    }
    for name in ("to_cond_embed", "to_global_embed", "to_prepend_embed"):
        if f"{name}.0.weight" in sd:
            p[name] = mlp(name, False)

    tr = {
        "project_in": {"kernel": lin("transformer.project_in.weight")},
        "project_out": {"kernel": lin("transformer.project_out.weight")},
    }
    if "transformer.global_cond_embedder.0.weight" in sd:
        tr["global_embed_in"] = {
            "kernel": lin("transformer.global_cond_embedder.0.weight"),
            "bias": sd["transformer.global_cond_embedder.0.bias"]}
        tr["global_embed_out"] = {
            "kernel": lin("transformer.global_cond_embedder.2.weight"),
            "bias": sd["transformer.global_cond_embedder.2.bias"]}

    for i in range(depth):
        b = f"transformer.layers.{i}"
        self_attn = {
            "to_qkv": {"kernel": lin(f"{b}.self_attn.to_qkv.weight")},
            "to_out": {"kernel": lin(f"{b}.self_attn.to_out.weight")},
        }
        if f"{b}.self_attn.q_norm.weight" in sd:
            self_attn["q_norm"] = {
                "scale": sd[f"{b}.self_attn.q_norm.weight"],
                "bias": sd[f"{b}.self_attn.q_norm.bias"]}
            self_attn["k_norm"] = {
                "scale": sd[f"{b}.self_attn.k_norm.weight"],
                "bias": sd[f"{b}.self_attn.k_norm.bias"]}
        layer = {
            "pre_norm": norm(f"{b}.pre_norm"),
            "ff_norm": norm(f"{b}.ff_norm"),
            "self_attn": self_attn,
            "ff": {
                "proj_in": {"kernel": lin(f"{b}.ff.ff.0.proj.weight"),
                            "bias": sd[f"{b}.ff.ff.0.proj.bias"]},
                "proj_out": {"kernel": lin(f"{b}.ff.ff.2.weight"),
                             "bias": sd[f"{b}.ff.ff.2.bias"]},
            },
        }
        if f"{b}.cross_attn.to_q.weight" in sd:
            layer["cross_attend_norm"] = norm(f"{b}.cross_attend_norm")
            cross = {
                "to_q": {"kernel": lin(f"{b}.cross_attn.to_q.weight")},
                "to_kv": {"kernel": lin(f"{b}.cross_attn.to_kv.weight")},
                "to_out": {"kernel": lin(f"{b}.cross_attn.to_out.weight")},
            }
            if f"{b}.cross_attn.q_norm.weight" in sd:
                cross["q_norm"] = {
                    "scale": sd[f"{b}.cross_attn.q_norm.weight"],
                    "bias": sd[f"{b}.cross_attn.q_norm.bias"]}
                cross["k_norm"] = {
                    "scale": sd[f"{b}.cross_attn.k_norm.weight"],
                    "bias": sd[f"{b}.cross_attn.k_norm.bias"]}
            layer["cross_attn"] = cross
        if f"{b}.to_scale_shift_gate" in sd:
            layer["to_scale_shift_gate"] = sd[f"{b}.to_scale_shift_gate"]
        tr[f"layer_{i}"] = layer

    p["transformer"] = tr
    return {"params": p}
