"""Orbax checkpointing with the reference's tree layout.

Checkpoints are ``{"model": TrainState, "config": {"model", "train", "data"}}``
(ref train.py:516-519, jax_helpers/train_helpers.py:395-409) so the analysis
engine can restore blind — and so checkpoints written by the reference repo
restore here.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict

import orbax.checkpoint as ocp


def _abspath(path: str) -> str:
    return path if os.path.isabs(path) else os.path.abspath(path.strip("/"))


def save_checkpoint(path: str, state, config: Dict[str, Any]) -> str:
    """Save {"model": state, "config": config}; destructive overwrite of an
    existing directory, as the reference does (ref :404-405)."""
    ckpt_dir = _abspath(path)
    if os.path.exists(ckpt_dir):
        shutil.rmtree(ckpt_dir)
    ckpt = {"model": state, "config": config}
    checkpointer = ocp.PyTreeCheckpointer()
    checkpointer.save(ckpt_dir, ckpt)
    return ckpt_dir


def restore_checkpoint(path: str) -> Dict[str, Any]:
    """Raw-restore a checkpoint directory into nested dicts."""
    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(_abspath(path))


def restore_params_host(path: str) -> Dict[str, Any]:
    """Restore ONLY the ``model.params`` subtree, as host numpy arrays.

    The standalone analysis path (analysis/compat.py ``load_params_any``)
    needs just the trained params; a full-tree restore also pulls the AdamW
    ``opt_state`` (two more param-sized trees) and materialises everything
    as device arrays — through the axon tunnel that is a ~3× larger
    transfer than the params the analysis will upload anyway.  Orbax
    partial restore (item skeleton + ``transforms={}``) reads only the
    params arrays from disk and keeps them on host."""
    ckpt_dir = _abspath(path)
    checkpointer = ocp.PyTreeCheckpointer()
    meta = checkpointer.metadata(ckpt_dir).item_metadata.tree
    params_meta = meta["model"]["params"]

    def skeleton(node):
        if isinstance(node, dict):
            return {k: skeleton(v) for k, v in node.items()}
        return 0

    def args(node):
        if isinstance(node, dict):
            return {k: args(v) for k, v in node.items()}
        import numpy as np

        return ocp.RestoreArgs(restore_type=np.ndarray)

    restored = checkpointer.restore(
        ckpt_dir,
        args=ocp.args.PyTreeRestore(
            item={"model": {"params": skeleton(params_meta)}},
            restore_args={"model": {"params": args(params_meta)}},
            transforms={},
        ),
    )
    return restored["model"]["params"]


def save_resume(path: str, state, meta: Dict[str, Any]) -> str:
    """Mid-training resume snapshot: ``{"model": TrainState, "meta": {...}}``.

    The reference has no mid-training resume at all (SURVEY.md §5) — this is
    the preemption-recovery improvement for long WikiText-scale runs on
    shared TPUs.  Written atomically (tmp dir + rename) so a preemption
    mid-save never corrupts the previous snapshot.
    """
    final = _abspath(path)
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    ocp.PyTreeCheckpointer().save(tmp, {"model": state, "meta": meta})
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def restore_resume(path: str, state_template, meta_template: Dict[str, Any]):
    """Typed restore of a resume snapshot (templates give orbax the pytree
    structure, so TrainState/optax nodes come back as the right types)."""
    return ocp.PyTreeCheckpointer().restore(
        _abspath(path), item={"model": state_template, "meta": meta_template}
    )
