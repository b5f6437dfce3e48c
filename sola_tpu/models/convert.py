"""PyTorch checkpoint -> JAX parameter conversion for the selection model.

Maps the reference's ``state_dict`` naming (module/module.py; checkpoints
saved as ``epoch_N.pth`` at train.py:246) onto the SelectionModel param tree,
transposing layouts:

    torch Conv1d weight (out, in, k)  -> flax Conv kernel (k, in, out)
    torch Linear weight (out, in)     -> flax Dense kernel (in, out)
    torch GroupNorm weight/bias       -> scale/bias

The reference Sequential places convs at indices 0,4,8,12,16,20 and
GroupNorms at 1,5,9,13,17 (module/module.py:74-96).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np

_CONV_SEQ_IDX = [0, 4, 8, 12, 16, 20]
_NORM_SEQ_IDX = [1, 5, 9, 13, 17]
_ATTN_NAMES = {
    "obj_attn": "obj_attn",
    "motion_attn": "motion_attn",
    "object2lang_attn": "object2lang_attn",
}
_NORM_NAMES = ["norm_obj", "norm_motion", "norm_lang"]


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, dtype=np.float32)


def torch_state_dict_to_params(state: Mapping[str, "np.ndarray"],
                               n_layers: int = 2) -> dict:
    """Convert a reference state_dict into ``{"params": ..., "buffers": ...}``."""
    params: dict = {}
    for i, seq in enumerate(_CONV_SEQ_IDX):
        w = _np(state[f"short_motion_encoder.{seq}.weight"])
        b = _np(state[f"short_motion_encoder.{seq}.bias"])
        params[f"conv_{i}"] = {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": b,
        }
    for i, seq in enumerate(_NORM_SEQ_IDX):
        params[f"conv_norm_{i}"] = {
            "scale": _np(state[f"short_motion_encoder.{seq}.weight"]),
            "bias": _np(state[f"short_motion_encoder.{seq}.bias"]),
        }
    for layer in range(n_layers):
        prefix = f"object_lang_align_layers.{layer}"
        node: dict = {}
        for torch_name, ours in _ATTN_NAMES.items():
            attn: dict = {}
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                w = _np(state[f"{prefix}.{torch_name}.{proj}.weight"])
                b = _np(state[f"{prefix}.{torch_name}.{proj}.bias"])
                attn[proj] = {"kernel": w.T, "bias": b}
            node[ours] = attn
        for norm_idx, ours in enumerate(_NORM_NAMES):
            node[ours] = {
                "scale": _np(state[f"{prefix}.norm.{norm_idx}.weight"]),
                "bias": _np(state[f"{prefix}.norm.{norm_idx}.bias"]),
            }
        params[f"align_{layer}"] = node
    params["negative_token"] = _np(state["negative_token.weight"])
    buffers = {
        "positional_encoding_gaussian":
            _np(state["positional_encoding_gaussian_matrix"]),
    }
    return {"params": params, "buffers": buffers}


def params_to_torch_state_dict(variables: Mapping, n_layers: int = 2) -> dict:
    """Inverse conversion, for exporting weights back to the reference format."""
    params = variables["params"]
    buffers = variables["buffers"]
    state: dict = {}
    for i, seq in enumerate(_CONV_SEQ_IDX):
        state[f"short_motion_encoder.{seq}.weight"] = np.transpose(
            np.asarray(params[f"conv_{i}"]["kernel"]), (2, 1, 0))
        state[f"short_motion_encoder.{seq}.bias"] = np.asarray(
            params[f"conv_{i}"]["bias"])
    for i, seq in enumerate(_NORM_SEQ_IDX):
        state[f"short_motion_encoder.{seq}.weight"] = np.asarray(
            params[f"conv_norm_{i}"]["scale"])
        state[f"short_motion_encoder.{seq}.bias"] = np.asarray(
            params[f"conv_norm_{i}"]["bias"])
    for layer in range(n_layers):
        prefix = f"object_lang_align_layers.{layer}"
        node = params[f"align_{layer}"]
        for torch_name, ours in _ATTN_NAMES.items():
            for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
                state[f"{prefix}.{torch_name}.{proj}.weight"] = np.asarray(
                    node[ours][proj]["kernel"]).T
                state[f"{prefix}.{torch_name}.{proj}.bias"] = np.asarray(
                    node[ours][proj]["bias"])
        for norm_idx, ours in enumerate(_NORM_NAMES):
            state[f"{prefix}.norm.{norm_idx}.weight"] = np.asarray(
                node[ours]["scale"])
            state[f"{prefix}.norm.{norm_idx}.bias"] = np.asarray(
                node[ours]["bias"])
    state["negative_token.weight"] = np.asarray(params["negative_token"])
    state["positional_encoding_gaussian_matrix"] = np.asarray(
        buffers["positional_encoding_gaussian"])
    return state
