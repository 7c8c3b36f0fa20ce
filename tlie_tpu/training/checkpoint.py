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
