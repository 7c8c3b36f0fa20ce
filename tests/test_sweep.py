"""Mesh sweep runner on the 8-virtual-device CPU mesh.

Exercises the TPU-native sweep capability (SURVEY.md §2.4): grid points
vmapped+sharded over the mesh, masked early stopping, per-point journaling,
and shape-group partitioning.
"""

import json
import os

import jax
import numpy as np
import pytest

from tlie_tpu.config import ExperimentConfig, expand_sweep
from tlie_tpu.data import SequenceDataset
from tlie_tpu.parallel.sweep import run_sweep_on_mesh, _shape_signature
from tlie_tpu.parallel.mesh import default_mesh


def _base_config(tmp_path):
    raw = {
        "seed": 7,
        "save": str(tmp_path / "sweep-ckpt"),
        "dataset": {
            "name": "MQAR", "_name_": "mqar",
            "input_seq_length": 32, "num_kv_pairs": 4, "vocab_size": 64,
            "num_train_examples": 256, "num_test_examples": 64,
            "fixed_size": True,
        },
        "train": {
            "total_steps": 20, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
            "eval_every": 10, "cosine_anneal": True, "param_group": None,
        },
        "model": {
            "input_dim": 1, "output_dim": 64, "layer": "transformer",
            "attention_fn": "lin-attention", "use_flash": False,
            "num_layers": 1, "hidden_dim": 32, "state_dim": 32,
            "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
            "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
            "mixer": "none", "mixer_dim": 32, "dropout": 0.0,
            "classifier": False, "pooling": "mean", "dual": False,
        },
    }
    return ExperimentConfig(raw).validate()


@pytest.mark.slow
def test_sweep_on_mesh_seeds_by_lr(tmp_path):
    assert jax.device_count() >= 8
    base = _base_config(tmp_path)
    ds = SequenceDataset.registry["mqar"](**base.dataset)
    ds.setup()
    metrics_fn = ds.get_metrics()
    base.derive_runtime_fields(ds)

    sweep = {"seed": [1, 2], "train": {"lr": [1e-3, 3e-3]}}
    points = expand_sweep(sweep)
    assert len(points) == 4

    mesh = default_mesh("grid", n_devices=4)
    results = run_sweep_on_mesh(base, points, ds, metrics_fn, mesh=mesh)
    assert len(results) == 4
    for path, perf in results:
        assert path is not None and os.path.isdir(path)
        assert np.isfinite(perf)
    # distinct seeds / lrs must give distinct outcomes
    perfs = [p for _, p in results]
    assert len(set(round(p, 6) for p in perfs)) > 1

    # journal written; re-running skips everything (resume support)
    journal = base.save + ".sweep_journal.jsonl"
    assert os.path.exists(journal)
    with open(journal) as f:
        assert len(f.readlines()) == 4
    results2 = run_sweep_on_mesh(base, points, ds, metrics_fn, mesh=mesh)
    assert [r[0] for r in results2] == [r[0] for r in results]


def test_shape_signature_groups():
    base = _base_config.__wrapped__ if hasattr(_base_config, "__wrapped__") else None
    cfg = ExperimentConfig({
        "seed": 1, "dataset": {"_name_": "mqar"},
        "train": {"batch_size": 8},
        "model": {"layer": "lru", "num_layers": 2, "hidden_dim": 16,
                  "state_dim": 8},
    })
    cfg2 = cfg.copy()
    cfg2.raw["model"]["num_layers"] = 4
    assert _shape_signature(cfg) != _shape_signature(cfg2)
    cfg3 = cfg.copy()
    cfg3.raw["train"]["lr"] = 123.0
    assert _shape_signature(cfg) == _shape_signature(cfg3)
