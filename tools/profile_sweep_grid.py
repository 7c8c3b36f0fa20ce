"""Why does the vmapped sweep grid net FEWER aggregate point-steps/s than a
single run (142.8 vs 205, round 4)?  Ablates the vmapped 4-seed lin-attention
grid: dropout on/off, grid width 1/4.

Usage: python tools/profile_sweep_grid.py [n_points] [dropout]
  dropout: "0" forces model dropout 0.0.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _LIN_ATT_MODEL, _MQAR_DATASET, _TRAIN, _sparse_k
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.models.registry import build_models
    from tlie_tpu.parallel.sweep import _stacked_state
    from tlie_tpu.training.scan_loop import (batch_indices, make_train_block,
                                             put_dataset)

    g = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    drop = 0.0 if (len(sys.argv) > 2 and sys.argv[2] == "0") else None

    model = dict(_LIN_ATT_MODEL)
    if drop is not None:
        model["dropout"] = drop
    raw = {"seed": 1919, "save": None, "dataset": dict(_MQAR_DATASET),
           "train": {**_TRAIN, "batch_size": 64}, "model": model}
    cfg = ExperimentConfig(raw).validate()
    ds = SequenceDataset.registry["mqar"](**cfg.dataset)
    ds.setup()
    cfg.derive_runtime_fields(ds)
    data = put_dataset(ds.train_inputs, ds.train_labels)
    train_model, _, _ = build_models(cfg.model, False)
    state = _stacked_state(cfg, train_model, [1919, 2222, 2929, 1717][:g],
                           integer_inputs=True)
    block = make_train_block(
        train_model, "layer", ("regular",), warmup=0,
        total_steps=8_000, cosine=True, lr_min=1e-6,
        sparse_head_k=_sparse_k(ds),
    )
    vblock = jax.jit(jax.vmap(
        lambda st, rng, d, idx, s0, lr, slr: block(st, rng, d, idx, s0, lr, slr),
        in_axes=(0, 0, None, None, None, 0, 0),
    ))
    K = 100
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(g, dtype=jnp.uint32))
    lrs = jnp.full((g,), 0.001, jnp.float32)
    idx = jnp.asarray(batch_indices(np.random.default_rng(0),
                                    len(ds.train_inputs), 64, K))
    s0 = jnp.asarray(0, jnp.int32)
    state, loss = vblock(state, rngs, data, idx[:1], s0, lrs, lrs)
    float(loss[0])
    state, loss = vblock(state, rngs, data, idx, s0, lrs, lrs)
    float(loss[0])
    t0 = time.perf_counter()
    state, loss = vblock(state, rngs, data, idx, s0, lrs, lrs)
    float(loss[0])
    t1 = time.perf_counter()
    state, loss = vblock(state, rngs, data, idx, s0, lrs, lrs)
    float(loss[0])
    t2 = time.perf_counter()
    rate = g * K / min(t1 - t0, t2 - t1)
    print(json.dumps({
        "metric": "sweep_grid_ablation",
        "points": g, "dropout": model["dropout"],
        "point_steps_per_sec": round(rate, 2),
    }))


if __name__ == "__main__":
    main()
