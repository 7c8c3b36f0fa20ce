"""Roofline ablation of the MQAR bench shapes (VERDICT r3 item 4).

The headline bench (mqar_lin_attention, B64 x L512 x d128, vocab 8192) has
read 82 +- 0.3 steps/s for three rounds with no analysis of whether that is
a floor or neglect.  This measures the PRODUCTION scanned train block
(bench.py protocol: same make_train_block, min-of-two timed K-step calls)
under one ablation per invocation:

  * num_layers 1/2/4  -> slope = per-layer cost, intercept = everything else
  * vocab 512 vs 8192 -> the embedding + decoder + CE path cost
  * K 25/100          -> per-dispatch overhead (tunnel + host) amortisation

Usage: python tools/profile_mqar_roofline.py FAMILY [K] [num_layers] [vocab] [fused]
  FAMILY in {lin, mamba2}.  Defaults: K=100, num_layers=2, vocab=8192.
  A 5th arg ``fused`` routes the loss through the fused decoder+CE Pallas
  kernel with bf16 MXU operands (ops/fused_xent.py) — the vocab-path
  alternative to XLA's materialised-logits CE.
Run on the chip, one variant per process (remote compiles are minutes cold).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import _LIN_ATT_MODEL, _MAMBA2_MODEL, _MQAR_DATASET, _setup
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training.scan_loop import (batch_indices, make_train_block,
                                             put_dataset)

    family = sys.argv[1] if len(sys.argv) > 1 else "lin"
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    nl = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    vocab = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
    fused = len(sys.argv) > 5 and sys.argv[5] == "fused"
    bf16 = "bf16" in sys.argv[5:]  # opt-in model.compute_dtype mode
    B = 64

    model_cfg = dict(_LIN_ATT_MODEL if family == "lin" else _MAMBA2_MODEL)
    model_cfg["num_layers"] = nl
    if bf16:
        model_cfg["compute_dtype"] = "bfloat16"
    ds_cfg = dict(_MQAR_DATASET)
    if vocab != 8192:
        # MQAR token values are bounded by the generator's vocab; clip the
        # stream so a smaller embedding + head isolates the vocab-path cost
        model_cfg.update(vocab_size=vocab, output_dim=vocab)
        ds_cfg["vocab_size"] = vocab

    ds = SequenceDataset.registry["mqar"](**ds_cfg)
    ds.setup()
    data = put_dataset(ds.train_inputs, ds.train_labels)

    cfg, train_model, state, rng = _setup(model_cfg, ds, ds_cfg, batch_size=B)
    from bench import _sparse_k

    sparse_k = _sparse_k(ds)  # TLIE_SPARSE_HEAD=0 ablates the sparse head
    block = make_train_block(
        train_model, "layer", ("regular",), warmup=0,
        total_steps=10_000, cosine=True, lr_min=1e-6, fused_head=fused,
        fused_head_dtype="bfloat16" if fused else None,
        sparse_head_k=None if fused else sparse_k,
    )
    idx = batch_indices(np.random.default_rng(0), len(ds.train_inputs), B, K)
    state, loss = block(state, rng, data, idx, 0, 0.01, 0.01)
    float(loss)
    t0 = time.perf_counter()
    state, loss = block(state, rng, data, idx, 0, 0.01, 0.01)
    float(loss)
    t1 = time.perf_counter()
    state, loss = block(state, rng, data, idx, 0, 0.01, 0.01)
    float(loss)
    t2 = time.perf_counter()
    ms = min(t1 - t0, t2 - t1) / K * 1e3
    print(json.dumps({
        "metric": "mqar_block_roofline",
        "variant": f"{family}_L{nl}_V{vocab}_K{K}"
        + ("_fused" if fused else "")
        + ("_bf16" if bf16 else "")
        + ("_dense" if sparse_k is None else f"_sparse{sparse_k}"),
        "ms_per_step": round(ms, 3),
        "steps_per_sec": round(1e3 / ms, 2),
    }))


if __name__ == "__main__":
    main()
