"""Analysis north star: eval_eig wall-clock per checkpoint, per family.

BASELINE.md tracks "eigenspectrum eval time per checkpoint"; this measures
the FULL analysis pipeline (init-model spectra + trained-model spectra +
radius/phase binning + all artifact writes) for every model family at the
reference's analysis batch sizes (mqar 64 / wikitext 8 / listops 32 —
ref configs/iclr2026/analysis_configs/*.yaml).

Each family gets a checkpoint from a few training steps at the FULL task
shapes, then one timed eval_eig call.  Prints one JSON line per row and a
final summary line.

Usage:  python tools/bench_analysis.py [mqar|wikitext|listops ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tlie_tpu.config import load_experiment  # noqa: E402

# (task, family) → (config path, analysis batch size)
ROWS = [
    ("mqar", "lru"), ("mqar", "s4"), ("mqar", "s5"),
    ("mqar", "lin-attention"), ("mqar", "sm-attention"),
    ("mqar", "norm-attention-conv"), ("mqar", "mamba2"),
    ("wikitext-103", "mamba2"), ("wikitext-103", "norm-attention-conv"),
    ("listops", "s4"), ("listops", "s5"),
]

ANALYSIS_BSZ = {"mqar": 64, "wikitext-103": 8, "listops": 32}

# small-footprint dataset overrides: analysis only needs ONE batch; training
# runs a handful of steps just to mint a checkpoint
DATA_OVERRIDES = {
    "mqar": {"num_train_examples": 512, "num_test_examples": 128},
    "wikitext-103": {"synthetic": True, "synthetic_train_tokens": 500_000,
                     "synthetic_test_tokens": 100_000},
    "listops": {"num_train": 2_000, "num_test": 200},
}


def run_row(task: str, family: str) -> dict:
    from tlie_tpu.analysis import eval_eig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    cfg = load_experiment(f"configs/tasks/{task}/{task}-{family}.yaml")
    cfg.dataset.update(DATA_OVERRIDES.get(task, {}))
    workdir = tempfile.mkdtemp(prefix=f"eig_{task}_{family}_")
    cfg.raw["save"] = os.path.join(workdir, "ck")
    bsz = cfg.train["batch_size"]
    cfg.train.update({"total_steps": 5, "eval_every": 5, "num_epochs": 1})

    ds = SequenceDataset.registry[cfg.dataset["_name_"]](**cfg.dataset)
    ds.setup()
    cfg.derive_runtime_fields(ds)
    # a few steps only — cap epoch-driven runs too
    cfg.train["train_size"] = min(cfg.train["train_size"], 5 * bsz)

    tl = ds.train_dataloader(batch_size=bsz, shuffle=True)
    el = ds.test_dataloader(batch_size=bsz, shuffle=False)
    try:
        result = train(cfg, tl, el, ds.get_metrics(), None)
        path, perf = result
        absz = ANALYSIS_BSZ[task]
        loader = ds.test_dataloader(batch_size=absz, shuffle=False)
        conf_args = {"batch_size": absz, "save_path": os.path.join(workdir, "out")}
        t0 = time.perf_counter()
        eval_eig(cfg.raw, conf_args, None, cfg.dataset, loader, path, perf)
        dt = time.perf_counter() - t0
        # warm pass: the jitted extractor/collector/init graphs are now
        # compiled — this is the per-checkpoint cost in a sweep or any
        # multi-checkpoint analysis run
        t1 = time.perf_counter()
        eval_eig(cfg.raw, conf_args, None, cfg.dataset, loader, path, perf)
        warm = time.perf_counter() - t1
        # in-memory pass: the primary launch.py train→analyze path hands the
        # trained params over directly (no orbax restore / param re-upload)
        t2 = time.perf_counter()
        eval_eig(cfg.raw, conf_args, None, cfg.dataset, loader, path, perf,
                 params=result.state.params)
        warm_mem = time.perf_counter() - t2
        row = {"task": task, "family": family, "analysis_batch": absz,
               "eval_eig_sec": round(dt, 2), "eval_eig_sec_warm": round(warm, 2),
               "eval_eig_sec_warm_inmem": round(warm_mem, 2)}
        print(json.dumps(row), flush=True)
        return row
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main():
    only = set(sys.argv[1:])
    rows = []
    for task, family in ROWS:
        if only and task.split("-")[0] not in only and task not in only:
            continue
        try:
            rows.append(run_row(task, family))
        except Exception as e:  # keep the sweep going; report the failure
            print(json.dumps({"task": task, "family": family,
                              "error": repr(e)[:200]}), flush=True)
    print(json.dumps({"metric": "eval_eig_sec_per_checkpoint_by_family",
                      "rows": rows}))


if __name__ == "__main__":
    main()
