"""Pretrained-LM attention spectroscopy (the lm_eigvals notebook, as a library).

Counterpart of ``notebooks/lm_eigvals.ipynb`` (SURVEY.md §3.5): hook the
q/k projections of a pretrained HF causal LM, stream evaluation batches
through it, recompute the softmax-attention eigenvalue ratio η per
(layer, head), cache per-batch results resumably, and threshold-bin the
concatenation.

The extraction math is the shared :func:`eta_softmax_from_qk` (on-device,
fp32-stabilised).  The model forward runs wherever the model lives — the
hook path supports torch CPU models (Llama-style ``{q,k}_proj`` and GPT-2
style fused ``c_attn``); η is then computed on the TPU.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, Iterable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .binning import RADIUS_THRESHOLDS, threshold_analysis
from .extractors import eta_softmax_from_qk

# jitted once: per-layer/per-batch calls share shapes, so the tunnel pays
# one compile instead of eager per-primitive dispatch
_j_eta = jax.jit(eta_softmax_from_qk)


def eta_from_torch_qk(q, k) -> np.ndarray:
    """(B, L, H, D) torch/numpy q, k → η (B, L−1, H) numpy."""
    q = np.asarray(q, dtype=np.float32)
    k = np.asarray(k, dtype=np.float32)
    return np.asarray(_j_eta(jnp.asarray(q), jnp.asarray(k)))


class QKHooks:
    """Forward hooks capturing per-layer q/k projections of a torch LM."""

    def __init__(self, model):
        import torch  # noqa: F401

        self.cache: Dict[int, Dict[str, "np.ndarray"]] = {}
        self.handles = []
        self.layers = self._find_layers(model)
        for i, layer in enumerate(self.layers):
            self._register(i, layer)

    @staticmethod
    def _find_layers(model) -> List:
        for path in ("model.layers", "transformer.h", "gpt_neox.layers"):
            obj = model
            ok = True
            for attr in path.split("."):
                if hasattr(obj, attr):
                    obj = getattr(obj, attr)
                else:
                    ok = False
                    break
            if ok:
                return list(obj)
        raise ValueError("Unrecognised LM layer layout")

    def _register(self, idx: int, layer) -> None:
        attn = getattr(layer, "self_attn", getattr(layer, "attn", None))
        if attn is None:
            raise ValueError(f"layer {idx}: no attention module found")

        def save(name):
            def hook(_mod, _inp, out):
                self.cache.setdefault(idx, {})[name] = out.detach().float().cpu().numpy()
            return hook

        if hasattr(attn, "q_proj"):  # Llama / OLMo style
            self.handles.append(attn.q_proj.register_forward_hook(save("q")))
            self.handles.append(attn.k_proj.register_forward_hook(save("k")))
        elif hasattr(attn, "c_attn"):  # GPT-2 fused qkv
            def split_hook(_mod, _inp, out):
                arr = out.detach().float().cpu().numpy()
                d = arr.shape[-1] // 3
                self.cache.setdefault(idx, {})["q"] = arr[..., :d]
                self.cache.setdefault(idx, {})["k"] = arr[..., d : 2 * d]
            self.handles.append(attn.c_attn.register_forward_hook(split_hook))
        else:
            raise ValueError(f"layer {idx}: unsupported attention projections")

    def pop_qk(self, num_heads: int) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Per-layer (q, k) with head split, clearing the cache."""
        out = []
        for i in range(len(self.layers)):
            q = self.cache[i]["q"]
            k = self.cache[i]["k"]
            b, l, dq = q.shape
            dk = k.shape[-1]
            hq = num_heads
            hk = max(1, num_heads * dk // dq)  # GQA: fewer kv heads
            q = q.reshape(b, l, hq, dq // hq)
            k = k.reshape(b, l, hk, dk // hk)
            if hk != hq:  # repeat kv heads for grouped-query attention
                k = np.repeat(k, hq // hk, axis=2)
            out.append((q, k))
        self.cache.clear()
        return out

    def remove(self) -> None:
        for h in self.handles:
            h.remove()


def lm_attention_spectra(
    model,
    batches: Iterable[np.ndarray],
    num_heads: int,
    cache_dir: str = "./lm_eigs",
    max_batches: Optional[int] = None,
) -> np.ndarray:
    """Run batches through a torch causal LM, η per (layer, head), with
    per-batch resumable caching (notebook cells 13-19 semantics: existing
    ``eigs_<i>.npy`` files are skipped)."""
    import torch

    os.makedirs(cache_dir, exist_ok=True)
    done = {
        int(m.group(1))
        for p in glob.glob(os.path.join(cache_dir, "eigs_*.npy"))
        if (m := re.search(r"eigs_(\d+)\.npy$", p))
    }
    start = max(done) + 1 if done else 0

    hooks = QKHooks(model)
    model.eval()
    try:
        for i, batch in enumerate(batches):
            if max_batches is not None and i >= max_batches:
                break
            if i < start:
                continue
            with torch.no_grad():
                model(torch.as_tensor(np.asarray(batch)))
            qks = hooks.pop_qk(num_heads)
            etas = [eta_from_torch_qk(q, k)[..., None] for q, k in qks]
            np.save(
                os.path.join(cache_dir, f"eigs_{i}.npy"),
                np.concatenate(etas, axis=-1),  # (B, L−1, H, layers)
            )
    finally:
        hooks.remove()

    parts = sorted(
        glob.glob(os.path.join(cache_dir, "eigs_*.npy")),
        key=lambda p: int(re.search(r"eigs_(\d+)\.npy$", p).group(1)),
    )
    all_eigs = np.concatenate([np.load(p) for p in parts], axis=0)
    np.save(os.path.join(cache_dir, "all_eigs.npy"), all_eigs)
    return all_eigs


def bin_lm_spectra(all_eigs: np.ndarray) -> Dict[str, np.ndarray]:
    """Radius histogram per (layer, head) — notebook cells 22-30."""
    pct = threshold_analysis(all_eigs, RADIUS_THRESHOLDS)
    return {
        "percentage": pct,
        "percentage_mean": pct.mean(axis=1),
        "percentage_std": pct.std(axis=1),
    }
