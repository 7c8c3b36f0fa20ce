"""Reference-checkpoint compatibility: load the original repo's checkpoints.

Two formats the reference writes (SURVEY.md §5):
  * torch ``state_dict`` .pth for the Transformer / Mamba families
    (ref train.py:218,388) — converted here into this framework's flax
    parameter trees (Dense kernels transposed, depthwise-conv weights
    re-laid-out, module names mapped);
  * orbax ``{"model": TrainState, "config": ...}`` for LRU/S4/S5
    (ref jax_helpers/train_helpers.py:395-409) — tree layout already
    matches; S4's complex P/B params are split into this framework's
    trailing (re, im) axis.

Entry point: :func:`load_params_any` — used by the analysis pipeline when
pointed at a reference checkpoint.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict

import numpy as np


def _t(w) -> np.ndarray:
    """torch Linear weight (out, in) → flax Dense kernel (in, out)."""
    return np.ascontiguousarray(np.asarray(w).T)


def _conv(w) -> np.ndarray:
    """torch depthwise Conv1d weight (C, 1, K) → ours (K, C)."""
    w = np.asarray(w)
    return np.ascontiguousarray(w[:, 0, :].T)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = np.asarray(value)


_COMMON_RULES = [
    # (regex on torch key, path builder)
    (r"^encoder\.word_embeddings\.weight$",
     lambda m, v: (("encoder", "word_embeddings", "embedding"), v)),
    (r"^encoder\.position_embeddings\.weight$",
     lambda m, v: (("encoder", "position_embeddings", "embedding"), v)),
    (r"^encoder\.weight$", lambda m, v: (("encoder", "kernel"), _t(v))),
    (r"^encoder\.bias$", lambda m, v: (("encoder", "bias"), v)),
    (r"^decoder\.weight$", lambda m, v: (("decoder", "kernel"), _t(v))),
    (r"^decoder\.bias$", lambda m, v: (("decoder", "bias"), v)),
    (r"^norm\.weight$", lambda m, v: (("norm", "scale"), v)),
    (r"^norm\.bias$", lambda m, v: (("norm", "bias"), v)),
    (r"^match\.(encoder|middle|decoder)\.weight$",
     lambda m, v: (("match", m.group(1), "kernel"), _t(v))),
    (r"^match\.(encoder|middle|decoder)\.bias$",
     lambda m, v: (("match", m.group(1), "bias"), v)),
    (r"^classifier\.(encoder|decoder)\.weight$",
     lambda m, v: (("classifier", m.group(1), "kernel"), _t(v))),
    (r"^classifier\.(encoder|decoder)\.bias$",
     lambda m, v: (("classifier", m.group(1), "bias"), v)),
]

_TRANSFORMER_RULES = [
    (r"^layers\.(\d+)\.attention\.(Wqkv|Wvqkn|out_proj)\.weight$",
     lambda m, v: ((f"layers_{m.group(1)}", "attention", m.group(2), "kernel"), _t(v))),
    (r"^layers\.(\d+)\.attention\.(Wqkv|Wvqkn|out_proj)\.bias$",
     lambda m, v: ((f"layers_{m.group(1)}", "attention", m.group(2), "bias"), v)),
    (r"^layers\.(\d+)\.attention\.conv1d\.weight$",
     lambda m, v: ((f"layers_{m.group(1)}", "attention", "conv1d", "weight"), _conv(v))),
    (r"^layers\.(\d+)\.attention\.conv1d\.bias$",
     lambda m, v: ((f"layers_{m.group(1)}", "attention", "conv1d", "bias"), v)),
    (r"^layers\.(\d+)\.attention\.inner_attn\.offset$",
     lambda m, v: ((f"layers_{m.group(1)}", "attention", "offset"), v)),
    (r"^layers\.(\d+)\.norm\.weight$",
     lambda m, v: ((f"layers_{m.group(1)}", "norm", "scale"), v)),
    (r"^layers\.(\d+)\.norm\.bias$",
     lambda m, v: ((f"layers_{m.group(1)}", "norm", "bias"), v)),
    (r"^layers\.(\d+)\.Wz\.weight$",
     lambda m, v: ((f"layers_{m.group(1)}", "Wz", "kernel"), _t(v))),
    (r"^layers\.(\d+)\.Wz\.bias$",
     lambda m, v: ((f"layers_{m.group(1)}", "Wz", "bias"), v)),
    (r"^layers\.(\d+)\.mixer\.linear\.weight$",  # GLU mixer
     lambda m, v: ((f"layers_{m.group(1)}", "mixer", "linear", "kernel"), _t(v))),
    (r"^layers\.(\d+)\.mixer\.linear\.bias$",
     lambda m, v: ((f"layers_{m.group(1)}", "mixer", "linear", "bias"), v)),
    (r"^layers\.(\d+)\.mixer\.(encoder|decoder)\.weight$",  # MLP / LAMBDA
     lambda m, v: ((f"layers_{m.group(1)}", "mixer", m.group(2), "kernel"), _t(v))),
    (r"^layers\.(\d+)\.mixer\.(encoder|decoder)\.bias$",
     lambda m, v: ((f"layers_{m.group(1)}", "mixer", m.group(2), "bias"), v)),
    (r"^layers\.(\d+)\.mixer\.alpha$",
     lambda m, v: ((f"layers_{m.group(1)}", "mixer", "alpha"), v)),
]

_MAMBA_RULES = [
    (r"^blocks\.(\d+)\.mamba\.(in_proj|out_proj)\.weight$",
     lambda m, v: ((f"blocks_{m.group(1)}", "mamba", m.group(2), "kernel"), _t(v))),
    (r"^blocks\.(\d+)\.mamba\.(in_proj|out_proj)\.bias$",
     lambda m, v: ((f"blocks_{m.group(1)}", "mamba", m.group(2), "bias"), v)),
    (r"^blocks\.(\d+)\.mamba\.conv1d\.weight$",
     lambda m, v: ((f"blocks_{m.group(1)}", "mamba", "conv1d", "weight"), _conv(v))),
    (r"^blocks\.(\d+)\.mamba\.conv1d\.bias$",
     lambda m, v: ((f"blocks_{m.group(1)}", "mamba", "conv1d", "bias"), v)),
    (r"^blocks\.(\d+)\.mamba\.(dt_bias|A_log|A|D)$",
     lambda m, v: ((f"blocks_{m.group(1)}", "mamba", m.group(2)), v)),
    (r"^blocks\.(\d+)\.glu\.linear\.weight$",
     lambda m, v: ((f"blocks_{m.group(1)}", "glu_layer", "linear", "kernel"), _t(v))),
    (r"^blocks\.(\d+)\.glu\.linear\.bias$",
     lambda m, v: ((f"blocks_{m.group(1)}", "glu_layer", "linear", "bias"), v)),
    (r"^blocks\.(\d+)\.norm\.weight$",
     lambda m, v: ((f"blocks_{m.group(1)}", "norm_layer", "scale"), v)),
    (r"^blocks\.(\d+)\.norm\.bias$",
     lambda m, v: ((f"blocks_{m.group(1)}", "norm_layer", "bias"), v)),
]


def torch_state_dict_to_flax(state_dict: Dict[str, Any], family: str) -> Dict:
    """Convert a reference torch state_dict (Transformer / Mamba model,
    ref models/transformer.py / models/mamba.py) into this framework's flax
    params tree."""
    rules = _COMMON_RULES + (
        _TRANSFORMER_RULES if family == "transformer" else _MAMBA_RULES
    )
    params: Dict = {}
    unmatched = []
    for key, value in state_dict.items():
        value = np.asarray(
            value.detach().cpu().numpy() if hasattr(value, "detach") else value
        )
        for pattern, builder in rules:
            m = re.match(pattern, key)
            if m:
                path, converted = builder(m, value)
                _set(params, path, converted)
                break
        else:
            if not key.endswith("beta"):  # SSD_LTI buffer, constant ones
                unmatched.append(key)
    if unmatched:
        raise ValueError(f"Unmapped torch keys: {unmatched}")
    return params


def _split_complex(tree):
    """Recursively split complex arrays into trailing (re, im) real axes —
    reference S4 orbax checkpoints store P/B as complex."""
    if isinstance(tree, dict):
        return {k: _split_complex(v) for k, v in tree.items()}
    arr = np.asarray(tree)
    if np.iscomplexobj(arr):
        return np.stack([arr.real, arr.imag], axis=-1).astype(np.float32)
    return arr


def load_params_any(path: str, model_config: Dict[str, Any]) -> Dict:
    """Load trained params from either a reference .pth or an orbax dir."""
    family = model_config["layer"]
    if path.endswith(".pth") or os.path.isfile(path):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if family not in ("transformer", "mamba"):
            raise ValueError(f".pth checkpoints are torch-family only, got {family}")
        return torch_state_dict_to_flax(sd, family)

    from ..training.checkpoint import restore_params_host

    # params-only host restore: skips the opt_state (2 more param-sized
    # trees) and the device round-trip of a full-tree restore — the warm
    # WikiText standalone analysis dropped 45-58 s → ~a third of it
    params = restore_params_host(path)
    return _split_complex(params)
