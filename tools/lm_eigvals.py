#!/usr/bin/env python3
"""Pretrained-LM eigenvalue spectroscopy CLI (the lm_eigvals notebook flow).

Usage:
    python tools/lm_eigvals.py --model <hf-local-path> [--dataset wikitext]
        [--batch_size 2] [--block_size 1024] [--max_batches 50]
        [--cache_dir ./lm_eigs]

Loads a local HF causal LM (torch CPU — no downloads in this environment),
hooks its q/k projections, streams WikiText test blocks through it,
extracts the softmax-attention η spectra per (layer, head) with resumable
per-batch caching, then threshold-bins and writes the percentage arrays.

Counterpart of notebooks/lm_eigvals.ipynb in the reference (SURVEY.md §3.5).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True, help="local HF model path")
    ap.add_argument("--dataset", default="wikitext")
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--batch_size", type=int, default=2)
    ap.add_argument("--block_size", type=int, default=1024)
    ap.add_argument("--max_batches", type=int, default=None)
    ap.add_argument("--cache_dir", default="./lm_eigs")
    args = ap.parse_args()

    from transformers import AutoConfig, AutoModelForCausalLM

    from tlie_tpu.analysis.lm_spectra import bin_lm_spectra, lm_attention_spectra
    from tlie_tpu.data import SequenceDataset

    model = AutoModelForCausalLM.from_pretrained(args.model, local_files_only=True)
    hf_cfg = AutoConfig.from_pretrained(args.model, local_files_only=True)
    num_heads = getattr(hf_cfg, "num_attention_heads", 8)

    ds = SequenceDataset.registry[args.dataset](
        _name_=args.dataset, data_dir=args.data_dir, block_size=args.block_size
    )
    ds.setup()

    def batches():
        n = len(ds.test_inputs)
        for i in range(0, n - args.batch_size + 1, args.batch_size):
            yield ds.test_inputs[i : i + args.batch_size]

    all_eigs = lm_attention_spectra(
        model, batches(), num_heads, cache_dir=args.cache_dir,
        max_batches=args.max_batches,
    )
    print(f"all_eigs: {all_eigs.shape} -> {args.cache_dir}/all_eigs.npy")

    stats = bin_lm_spectra(all_eigs)
    for k, v in stats.items():
        np.save(os.path.join(args.cache_dir, f"{k}.npy"), v)
    summary = {
        "shape": list(all_eigs.shape),
        "mean_radius_bins_first_layer": stats["percentage_mean"][:, 0, 0].tolist(),
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
