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


def load_torch_ckpt(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint/state_dict file into numpy (requires torch)."""
    import torch  # local import: torch is optional at runtime

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in obj.items()
            if hasattr(v, "detach")}
