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
from tlie_tpu.parallel.sweep import run_sweep_on_mesh, _group_signature
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


def test_group_signature():
    """Only the per-point threaded keys (seed, lr, ssm_lr) may share a
    compiled group; ANY other differing key must split the grid, because
    everything else is built from the group leader's config."""
    cfg = ExperimentConfig({
        "seed": 1, "dataset": {"_name_": "mqar"},
        "train": {"batch_size": 8, "lr": 1e-3, "wd": 0.1},
        "model": {"layer": "lru", "num_layers": 2, "hidden_dim": 16,
                  "state_dim": 8},
    })
    # shape keys still split
    cfg2 = cfg.copy()
    cfg2.raw["model"]["num_layers"] = 4
    assert _group_signature(cfg) != _group_signature(cfg2)
    # per-point threaded keys do NOT split
    cfg3 = cfg.copy()
    cfg3.raw["train"]["lr"] = 123.0
    cfg3.raw["train"]["ssm_lr"] = 5.0
    cfg3.raw["seed"] = 42
    assert _group_signature(cfg) == _group_signature(cfg3)
    # non-shape, non-threaded keys MUST split (wd was the round-4 trap)
    cfg4 = cfg.copy()
    cfg4.raw["train"]["wd"] = 0.9
    assert _group_signature(cfg) != _group_signature(cfg4)
    cfg5 = cfg.copy()
    cfg5.raw["model"]["norm_fn"] = "softmax"
    assert _group_signature(cfg) != _group_signature(cfg5)


@pytest.mark.slow
def test_sweep_parallel_matches_serial_arbitrary_param(tmp_path, monkeypatch):
    """Sweeping a non-shape, non-lr param (train.wd) with dropout active:
    each mesh-parallel point must reproduce the serial loop's result for
    ITS OWN config — regression for the round-4 trap where every point
    trained the group leader's wd, and for grid-slot-derived dropout
    streams.

    Exact bitwise equality is prevented by vmap float reassociation (the
    per-point rng keys are bit-identical — verified in debugging — but
    batched matmuls reassociate, and Adam amplifies the drift over steps),
    so the assertion is relative: every sweep point's params must be far
    closer to its own serial counterpart than to the other point's."""
    # the TPU-fast rbg dropout impl is implementation-defined under vmap;
    # threefry is the stream that is vmap-consistent with the serial path
    # (the env var is captured at module import — patch the module constant)
    from tlie_tpu.training import scan_loop

    monkeypatch.setattr(scan_loop, "_DROPOUT_RNG_IMPL", "threefry")
    from tlie_tpu.training import train
    from tlie_tpu.training.checkpoint import restore_params_host

    base = _base_config(tmp_path)
    base.raw["model"]["dropout"] = 0.1  # exercise the dropout rng stream
    ds = SequenceDataset.registry["mqar"](**base.dataset)
    ds.setup()
    metrics_fn = ds.get_metrics()
    base.derive_runtime_fields(ds)

    # seed × wd: two compile groups (one per wd), two seeds per group.
    # Sweeping seeds too keeps the checkpoint paths distinct (the
    # reference-parity checkpoint name embeds seed but not wd, and equal
    # perfs would otherwise collide the paths, ref train.py:711-715) and
    # exercises per-point rng/batch streams inside a multi-point group.
    sweep = {"seed": [7, 8], "train": {"wd": [0.0, 5.0]}}
    points = expand_sweep(sweep)
    assert len(points) == 4

    mesh = default_mesh("grid", n_devices=4)
    results = run_sweep_on_mesh(base, points, ds, metrics_fn, mesh=mesh)

    bsz = base.train["batch_size"]
    trainloader = ds.train_dataloader(batch_size=bsz, shuffle=True)
    testloader = ds.test_dataloader(batch_size=bsz, shuffle=False)
    from tlie_tpu.config import apply_sweep_point

    def _flat(tree):
        return np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree_util.tree_leaves(tree)]
        )

    serial_params = []
    for point, (path, perf) in zip(points, results):
        cfg_i = apply_sweep_point(base, point)
        cfg_i.derive_runtime_fields(ds)
        cfg_i.raw["save"] = None  # don't clobber the sweep checkpoints
        cfg_i.train["data_parallel"] = False  # single-device serial baseline
        res = train(cfg_i, trainloader, testloader, metrics_fn)
        assert abs(res[1] - perf) < 2e-3, (point, res[1], perf)
        serial_params.append(_flat(jax.device_get(res.state.params)))

    for i, (path, _) in enumerate(results):
        sweep_i = _flat(restore_params_host(path))
        d_own = np.abs(sweep_i - serial_params[i]).max()
        d_cross = min(
            np.abs(sweep_i - serial_params[j]).max()
            for j in range(len(points)) if j != i
        )
        assert d_own < d_cross / 10, (i, d_own, d_cross)
