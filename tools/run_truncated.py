"""Run a task config end-to-end (train → checkpoint → eigen-analysis) with a
truncated budget — chip-evidence runs for task × family coverage without the
full multi-hour reference budget.

Usage:
  python tools/run_truncated.py --config configs/tasks/cifar/cifar-s5.yaml \
      [--epochs 2 | --steps 2000] [--analysis_batch 64] [--train_examples N]

Everything else (model size, task shapes, optimizer groups, analysis
artifact set) stays exactly the reference configuration.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--train_examples", type=int, default=None,
                    help="cap the train split (epoch-driven runs)")
    ap.add_argument("--analysis_batch", type=int, default=None,
                    help="run eval_eig at this batch size after training")
    ap.add_argument("--save_path", default="./analysis_results/")
    args = ap.parse_args()

    from tlie_tpu.config import load_experiment
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    cfg = load_experiment(args.config)
    if args.epochs is not None:
        cfg.train["num_epochs"] = args.epochs
    if args.steps is not None:
        cfg.train["total_steps"] = args.steps

    ds = SequenceDataset.registry[cfg.dataset["_name_"]](**cfg.dataset)
    ds.setup()
    cfg.derive_runtime_fields(ds)
    if args.train_examples is not None:
        cfg.train["train_size"] = min(cfg.train["train_size"], args.train_examples)

    bsz = cfg.train["batch_size"]
    tl = ds.train_dataloader(batch_size=bsz, shuffle=True)
    el = ds.test_dataloader(batch_size=bsz, shuffle=False)
    result = train(cfg, tl, el, ds.get_metrics(layer=cfg.layer), None)
    path, perf = result
    print(f"[truncated] ckpt {path} perf {perf:.4f}", flush=True)

    if args.analysis_batch and path:
        from tlie_tpu.analysis import eval_eig

        loader = ds.test_dataloader(batch_size=args.analysis_batch, shuffle=False)
        conf_args = {"batch_size": args.analysis_batch, "save_path": args.save_path}
        eval_eig(cfg.raw, conf_args, None, cfg.dataset, loader, path, perf,
                 params=result.state.params)


if __name__ == "__main__":
    main()
