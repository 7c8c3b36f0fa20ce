"""Vocab-parallel (tensor-parallel) sharding for the LM head.

The reference is strictly single-GPU (SURVEY.md §2.4), so — like the mesh
sweeps and data parallelism — this is new TPU-native capability, not ported
behavior.  At the reference LM shapes (hidden 512, vocab 50257,
ref configs/iclr2026/wikitext/wikitext-103-mamba2.yaml) the token
embedding + decoder head hold ~26M of the 61M parameters and the decoder
matmul plus its (B, L, 50257) logits cube dominate both FLOPs and HBM.
Sharding the vocabulary axis over a ``model`` mesh axis splits exactly
those tensors; everything else stays replicated, and XLA/GSPMD inserts the
collectives (an all-reduce for the logsumexp over the sharded vocab axis,
a psum for the embedding gather) — no hand-written comms, per the
scaling-book recipe.

Partition rules are *path-based* so one rule set applies uniformly to
``state.params`` and to every optimizer moment that mirrors the param tree
(optax multi_transform inner mu/nu): a leaf is matched by the trailing
segments of its tree path, falling back to fully-replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.tree_util import keystr, tree_flatten_with_path, tree_unflatten

# (path-suffix segments, expected ndim, spec) — vocab axis sharded on "model".
# word_embeddings: (vocab, hidden); decoder kernel: (hidden, vocab);
# decoder bias: (vocab,).  Suffixes mirror the reference checkpoint tree
# (ref models/common.py:117-176 TokenEmbeddings, models/mamba.py:342-389 /
# models/transformer.py:113-161 decoder naming, preserved here for orbax
# layout parity).
_VOCAB_RULES = (
    (("word_embeddings", "embedding"), 2, P("model", None)),
    (("decoder", "kernel"), 2, P(None, "model")),
    (("decoder", "bias"), 1, P("model")),
)

# Per-block / per-head subtrees that legitimately contain a "decoder" Dense
# of their own (transformer MLP/LAMBDA mixers, the MATCH and classifier
# heads).  Only the MODEL-level decoder/embedding is the vocab head; a
# substring match would silently tensor-parallel-shard these small Denses
# too, adding per-layer collectives and risking shards smaller than the
# model axis.
_EXCLUDED_SEGMENTS = ("mixer", "match", "classifier", "attention", "glu_layer")


def _path_segments(path) -> tuple:
    segs = []
    for entry in path:
        for attr in ("key", "name", "idx"):
            if hasattr(entry, attr):
                segs.append(str(getattr(entry, attr)))
                break
        else:
            segs.append(str(entry))
    return tuple(segs)


def _spec_for(segs: tuple, ndim: int) -> P:
    if any(
        s in _EXCLUDED_SEGMENTS or s.startswith(("layers_", "blocks_"))
        for s in segs
    ):
        return P()
    for suffix, want_ndim, spec in _VOCAB_RULES:
        if segs[-len(suffix):] == suffix and ndim == want_ndim:
            return spec
    return P()


def vocab_partition_specs(tree: Any) -> Any:
    """PartitionSpec pytree matching ``tree`` (params, or a whole TrainState:
    optimizer moments that mirror the param tree pick up the same specs)."""
    leaves, treedef = tree_flatten_with_path(tree)
    specs = []
    for path, leaf in leaves:
        ndim = getattr(leaf, "ndim", 0)
        specs.append(_spec_for(_path_segments(path), ndim))
    return tree_unflatten(treedef, specs)


def shard_vocab_parallel(tree: Any, mesh: Mesh) -> Any:
    """Place ``tree`` on ``mesh`` with the vocab axes split over "model" and
    everything else replicated.  Works on params or a full TrainState."""
    specs = vocab_partition_specs(tree)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def mesh_2d(n_model: int, axis_data: str = "data", axis_model: str = "model") -> Mesh:
    """(data, model) mesh over all local devices; n_model must divide them."""
    import numpy as np

    devs = jax.devices()
    if len(devs) % n_model != 0:
        raise ValueError(f"{len(devs)} devices not divisible by model_parallel={n_model}")
    grid = np.asarray(devs).reshape(len(devs) // n_model, n_model)
    return Mesh(grid, (axis_data, axis_model))
