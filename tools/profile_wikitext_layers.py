"""Layer-count ablation of the PRODUCTION WikiText train block.

The subtractive profile (profile_wikitext_step.py) can be distorted by XLA
pruning/hoisting inside its synthetic loops; this measures the real scanned
block — gather + fwd + CE + bwd + clip + AdamW + LR injection — at
num_layers ∈ {1, 3, 6}.  The slope is the true per-layer cost; the
intercept is head + embedding + optimizer-fixed + step overheads.

Usage: python tools/profile_wikitext_layers.py [K]   (run on the chip)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 30


def measure(model_cfg, wt, data, B=8, fused=False):
    from bench import _WT_DATASET, _setup
    from tlie_tpu.training.scan_loop import batch_indices, make_train_block

    cfg, model, state, rng = _setup(model_cfg, wt, _WT_DATASET, batch_size=B)
    block = make_train_block(
        model, "layer", ("regular",), 0, 10_000, True, 1e-6,
        fused_head=fused,
        fused_head_dtype="bfloat16" if model_cfg.get("compute_dtype") else None,
    )
    idx = batch_indices(np.random.default_rng(0), len(wt.train_inputs), B, K)
    state, loss = block(state, rng, data, idx, 0, 1e-3, 1e-3)
    float(loss)
    t0 = time.perf_counter()
    state, loss = block(state, rng, data, idx, 0, 1e-3, 1e-3)
    float(loss)
    t1 = time.perf_counter()
    state, loss = block(state, rng, data, idx, 0, 1e-3, 1e-3)
    float(loss)
    t2 = time.perf_counter()
    return min(t1 - t0, t2 - t1) / K * 1e3


def main():
    from bench import _WT_DATASET, _WT_MAMBA2_MODEL
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training.scan_loop import put_dataset

    wt = SequenceDataset.registry["wikitext"](
        **{**_WT_DATASET, "synthetic_train_tokens": 300_000,
           "synthetic_test_tokens": 50_000}
    )
    wt.setup()
    data = put_dataset(wt.train_inputs, wt.train_labels)

    # one variant per invocation (a remote compile costs ~30-60 s; four in
    # one process can exceed a driver timeout): args are [K] [num_layers]
    # [dtype] — dtype ∈ {bf16, f32}
    nl = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    dt = sys.argv[3] if len(sys.argv) > 3 else "bf16"
    vocab = int(sys.argv[4]) if len(sys.argv) > 4 else None
    fused = len(sys.argv) > 5 and sys.argv[5] == "fused"
    chunk = int(sys.argv[6]) if len(sys.argv) > 6 else None
    cfg = dict(_WT_MAMBA2_MODEL, num_layers=nl)
    if dt == "bf16":
        cfg["compute_dtype"] = "bfloat16"
    if chunk:
        cfg["chunk_size"] = chunk
    tag = f"{dt}_L{nl}" + ("_fused" if fused else "") + (f"_Q{chunk}" if chunk else "")
    if vocab:
        # vocab ablation: clip the token stream and shrink embedding + head
        # to isolate the vocab-path cost (embedding scatter, decoder, CE)
        cfg.update(vocab_size=vocab, output_dim=vocab)
        data = put_dataset(np.minimum(wt.train_inputs, vocab - 1),
                           np.where(wt.train_labels >= 0,
                                    np.minimum(wt.train_labels, vocab - 1),
                                    wt.train_labels))
        wt.train_inputs = np.minimum(wt.train_inputs, vocab - 1)
        tag += f"_V{vocab}"
    ms = round(measure(cfg, wt, data, fused=fused), 2)
    print(json.dumps({"metric": "wikitext_block_layer_ablation",
                      "variant": tag, "ms_per_step": ms,
                      "steps_per_sec": round(1e3 / ms, 2)}))


if __name__ == "__main__":
    main()
