#!/usr/bin/env python3
"""Generate the full task×model config matrix under configs/tasks/.

Mirrors the reference's 39-config iclr2026 matrix (hyperparameters taken
from /root/reference/configs/iclr2026/** — see SURVEY.md §2.1) plus S5
variants the reference registry supports but never shipped configs for.
Run from the repo root:  python tools/gen_configs.py
"""

from __future__ import annotations

import copy
from pathlib import Path

import yaml

OUT = Path("configs/tasks")

# ---------------------------------------------------------------- datasets

DATASETS = {
    "mqar": {
        "dataset": {"name": "MQAR", "_name_": "mqar", "input_seq_length": 512,
                    "num_kv_pairs": 64, "data_dir": "", "fixed_size": True},
        "train": {"total_steps": 40_000, "batch_size": 64, "eval_every": 200,
                  "stop_criterion": 0.99, "cosine_anneal": True,
                  "param_group": None, "wd": 0.1},
        "dims": {"in": 1, "out": 8192, "hidden": 128, "state": 128, "layers": 2,
                 "heads": 1, "vocab": 8192, "max_pos": 512, "mixer_dim": 128,
                 "classify": False, "pooling": "mean"},
        "warmup": ("warmup_steps", 4000),
    },
    "wikitext-103": {
        "dataset": {"name": "WikiText", "_name_": "wikitext", "version": 103,
                    "block_size": 1024, "data_dir": "", "fixed_size": True},
        "train": {"total_steps": 130_000, "batch_size": 8, "eval_every": 1000,
                  "betas": [0.9, 0.95], "param_group": None, "wd": 0.1,
                  "cosine_anneal": True},
        "dims": {"in": 1, "out": 50257, "hidden": 512, "state": 512, "layers": 6,
                 "heads": 8, "vocab": 50257, "max_pos": 1024, "mixer_dim": 512,
                 "classify": False, "pooling": "mean"},
        "warmup": ("warmup_steps", 3000),
    },
    "listops": {
        "dataset": {"name": "LISTOPS", "_name_": "listops",
                    "data_dir": "./data/listops", "fixed_size": False},
        "train": {"num_epochs": 50, "batch_size": 8, "param_group": None,
                  "wd": 0.1, "cosine_anneal": True},
        "dims": {"in": 1, "out": 10, "hidden": 128, "state": 64, "layers": 6,
                 "heads": 4, "vocab": 18, "max_pos": 2048, "mixer_dim": 256,
                 "classify": True, "pooling": "mean"},
        "warmup": ("warmup", 5),
    },
    "imdb": {
        "dataset": {"name": "IMDB", "_name_": "imdb", "data_dir": "",
                    "fixed_size": False},
        "train": {"num_epochs": 30, "batch_size": 6, "param_group": None,
                  "wd": 0.1, "cosine_anneal": True},
        "dims": {"in": 1, "out": 2, "hidden": 128, "state": 64, "layers": 4,
                 "heads": 4, "vocab": 134, "max_pos": 4096, "mixer_dim": 512,
                 "classify": True, "pooling": "mean"},
        "warmup": ("warmup", 5),
    },
    "cifar": {
        "dataset": {"name": "CIFAR-10", "_name_": "cifar", "grayscale": True},
        "train": {"num_epochs": 50, "batch_size": 50, "param_group": None,
                  "wd": 0.0, "cosine_anneal": True},
        "dims": {"in": 1, "out": 10, "hidden": 512, "state": 64, "layers": 6,
                 "heads": 4, "vocab": 256, "max_pos": 1024, "mixer_dim": 128,
                 "classify": True, "pooling": "mean"},
        "warmup": ("warmup", 5),
    },
}

# SSM-family lr/wd per task (from the reference configs)
SSM_TRAIN = {
    "mqar": {"lr": 0.00046416, "wd": 0.01, "ssm_lr": 0.001, "lr_min": 1e-7,
             "reduce_factor": 0.5, "lr_patience": 200},
    "wikitext-103": {"lr": 0.001, "wd": 0.1, "ssm_lr": 0.001, "lr_min": 1e-7,
                     "reduce_factor": 0.5, "lr_patience": 5},
    "listops": {"lr": 0.0005, "wd": 0.0, "ssm_lr": 0.001, "lr_min": 1e-7,
                "reduce_factor": 0.5, "lr_patience": 5},
    "imdb": {"lr": 0.0005, "wd": 0.0, "ssm_lr": 0.001, "lr_min": 1e-7,
             "reduce_factor": 0.5, "lr_patience": 5},
    "cifar": {"lr": 0.005, "wd": 0.05, "ssm_lr": 0.001, "lr_min": 1e-7,
              "reduce_factor": 0.5, "lr_patience": 20},
}

ATT_LR = {  # transformer-family lr per (task, attention kind)
    ("mqar", "lin"): 0.01, ("mqar", "sm"): 0.00046416, ("mqar", "norm"): 0.001,
    ("wikitext-103", "lin"): 0.0005, ("wikitext-103", "sm"): 0.001,
    ("wikitext-103", "norm"): 0.001,
    ("listops", "lin"): 0.0002, ("listops", "sm"): 0.0002, ("listops", "norm"): 0.0004,
    ("imdb", "lin"): 0.0002, ("imdb", "sm"): 0.0002, ("imdb", "norm"): 0.0004,
    ("cifar", "lin"): 0.0002, ("cifar", "sm"): 0.0002, ("cifar", "norm"): 0.0002,
}

MAMBA_TRAIN = {
    "mqar": {"lr": 0.01, "wd": 0.1},
    "wikitext-103": {"lr": 0.001, "wd": 0.1},
    "listops": {"lr": 0.0005, "wd": 0.01},
    "imdb": {"lr": 0.0005, "wd": 0.01},
    "cifar": {"lr": 0.0002, "wd": 0.0},
}


def base(task: str) -> dict:
    spec = DATASETS[task]
    cfg = {
        "seed": 1919,
        "save": None,  # filled per model
        "dataset": copy.deepcopy(spec["dataset"]),
        "train": copy.deepcopy(spec["train"]),
        "model": {},
    }
    key, val = spec["warmup"]
    cfg["train"][key] = val
    return cfg


def ssm_model(task: str, layer: str, extra: dict | None = None) -> dict:
    d = DATASETS[task]["dims"]
    in_dim = d["vocab"] if task in ("mqar", "wikitext-103") else (
        d["vocab"] + 1 if task in ("listops", "imdb") else 1
    )
    # reference: listops in_dim 20, imdb 135 (vocab+1); cifar 1
    if task == "listops":
        in_dim = 20
    if task == "imdb":
        in_dim = 135
    m = {
        "layer": layer,
        "dt_min": 0.001, "dt_max": 0.1,
        "num_layers": d["layers"],
        "activation": "full_glu",
        "input_dim": in_dim, "output_dim": d["out"],
        "hidden_dim": d["hidden"], "state_dim": d["state"],
        "dropout": 0.1 if task in ("mqar", "cifar") else 0,
        "norm": "batch",
        "pooling": "none" if task in ("mqar", "wikitext-103") else "mean",
        "ssm_lr_vars": ["Lambda_re", "Lambda_im", "P", "B", "log_step"],
        "prenorm": task in ("listops", "imdb"),
        "dual": False,
        "decode": False,
    }
    if layer == "lru":
        m.update({"r_min": 0.9, "r_max": 0.99})
        m["ssm_lr_vars"] = ["Lambda_re", "Lambda_im", "P", "B", "log_step"] \
            if task != "mqar" else m["ssm_lr_vars"]
    if layer == "s5":
        m.update({"C_init": "lecun_normal", "discretization": "zoh",
                  "conj_sym": True, "num_blocks": 8})
    m.update(extra or {})
    return m


def transformer_model(task: str, kind: str, extra: dict | None = None) -> dict:
    d = DATASETS[task]["dims"]
    m = {
        "input_dim": d["in"], "output_dim": d["out"],
        "layer": "transformer",
        "num_layers": d["layers"], "hidden_dim": d["hidden"],
        "state_dim": d["state"] if task != "mqar" else 128,
        "num_heads": d["heads"],
        "att_dropout": 0.1 if task in ("listops", "imdb") else (
            0.2 if task == "cifar" and kind == "lin" else 0.0
        ),
        "norm": "layer",
        "embedding": True,
        "vocab_size": d["vocab"],
        "max_pos_embed": d["max_pos"],
        "mixer": "none" if task == "mqar" else "mlp",
        "mixer_dim": d["mixer_dim"],
        "dropout": 0.1 if task in ("mqar", "listops", "imdb") else (
            0.3 if task == "cifar" and kind == "lin" else 0.0
        ),
        "classifier": d["classify"],
        "pooling": d["pooling"],
        "dual": False,
    }
    if kind == "lin":
        m.update({"attention_fn": "lin-attention", "use_flash": False})
    elif kind == "sm":
        m.update({"attention_fn": "sm-attention", "use_flash": True})
    elif kind == "norm":
        m.update({
            "attention_fn": "norm-attention", "mode": "attention",
            "norm_fn": "softplus", "approx_fn": "elu", "scale_B": True,
            "offset": True, "offset_init": "exp", "learn_A": False,
            "dim_conv": 4, "use_flash": False, "max_pos_embed": 0,
        })
    m.update(extra or {})
    return m


def mamba_model(task: str, extra: dict | None = None) -> dict:
    d = DATASETS[task]["dims"]
    token_embed = task in ("mqar", "wikitext-103", "listops", "imdb")
    m = {
        "layer": "mamba", "version": "mamba2",
        "num_layers": d["layers"],
        "num_heads": 1 if task == "mqar" else (8 if task == "wikitext-103" else 4),
        "input_dim": d["in"], "output_dim": d["out"],
        "hidden_dim": d["hidden"],
        "state_dim": d["state"] if task != "mqar" else 128,
        "conv_dim": 4, "expansion": 1, "dropout": 0.0,
        "glu": True, "norm": "layer", "dual": False,
        "prenorm": task != "cifar",
        "pooling": "none" if task in ("mqar", "wikitext-103") else "mean",
        "embedding": True, "token_embedding": token_embed,
        "vocab_size": d["vocab"], "max_pos_embed": d["max_pos"],
        "mixer": "none", "mixer_dim": d["mixer_dim"], "classifier": False,
    }
    m.update(extra or {})
    return m


def emit(task: str, name: str, model: dict, train_extra: dict | None = None,
         dataset_extra: dict | None = None):
    cfg = base(task)
    cfg["save"] = f"./checkpoint/{task}-{name}"
    cfg["model"] = model
    cfg["train"].update(train_extra or {})
    if dataset_extra:
        cfg["dataset"].update(dataset_extra)
    out = OUT / task / f"{task}-{name}.yaml"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        yaml.dump(cfg, f, default_flow_style=False, sort_keys=False)


def main():
    for task in DATASETS:
        ssm_tr = SSM_TRAIN[task]
        # reference listops splits batch size by family: ssm/mamba train at
        # batch 50, attention at batch 8 (ref listops/listops-{s4,lru,mamba2}
        # vs listops-{lin,sm,norm-attention}*.yaml)
        ssm_bsz = {"batch_size": 50} if task == "listops" else {}
        # SSM families
        emit(task, "lru", ssm_model(task, "lru"), {**ssm_tr, **ssm_bsz})
        emit(task, "s4", ssm_model(task, "s4"), {**ssm_tr, **ssm_bsz})
        emit(task, "s5", ssm_model(task, "s5"), {**ssm_tr, **ssm_bsz})
        # transformer families
        for kind, suffix in (("lin", "lin-attention"), ("sm", "sm-attention"),
                             ("norm", "norm-attention-conv")):
            emit(task, suffix, transformer_model(task, kind),
                 {"lr": ATT_LR[(task, kind)]})
        # mamba
        emit(task, "mamba2", mamba_model(task), {**MAMBA_TRAIN[task], **ssm_bsz})

    # CIFAR extra variants (ref has 15 cifar configs)
    emit("cifar", "mamba2-pseudoLTI", mamba_model("cifar", {"pseudoLTI": True}),
         MAMBA_TRAIN["cifar"])
    emit("cifar", "lin-attention-conv",
         transformer_model("cifar", "lin", {"dim_conv": 4}), {"lr": 0.0002},
         dataset_extra={"tokenize": True})
    emit("cifar", "lin-attention-gating",
         transformer_model("cifar", "lin", {"use_gate": True}), {"lr": 0.0002},
         dataset_extra={"tokenize": True})
    emit("cifar", "sm-attention-conv",
         transformer_model("cifar", "sm", {"dim_conv": 4}), {"lr": 0.0002},
         dataset_extra={"tokenize": True})
    for nf in ("exp", "elu", "sigmoid"):
        emit("cifar", f"norm-attention-{nf}",
             transformer_model("cifar", "norm", {"norm_fn": nf, "approx_fn": "none"}),
             {"lr": 0.0002})
    emit("cifar", "norm-attention-noconv",
         transformer_model("cifar", "norm", {"dim_conv": 0}), {"lr": 0.0002})
    emit("cifar", "norm-attention-gating",
         transformer_model("cifar", "norm", {"use_gate": True}), {"lr": 0.0002})
    # tokenized-input variants for cifar attention (ref pairs tokenize with lin/sm)
    emit("cifar", "lin-attention", transformer_model("cifar", "lin"),
         {"lr": 0.0002}, dataset_extra={"tokenize": True})
    emit("cifar", "sm-attention", transformer_model("cifar", "sm"),
         {"lr": 0.0002}, dataset_extra={"tokenize": True})

    # analysis configs (ref analysis_configs/*)
    adir = Path("configs/analysis")
    adir.mkdir(parents=True, exist_ok=True)
    for task, bsz in (("mqar", 64), ("wikitext", 8), ("cifar", 64),
                      ("listops", 32), ("imdb", 32)):
        with open(adir / f"{task}.yaml", "w") as f:
            yaml.dump({"batch_size": bsz, "save_path": "./analysis_results/"},
                      f, sort_keys=False)

    # sweep configs (ref sweep/**)
    sdir = Path("configs/sweep")
    sdir.mkdir(parents=True, exist_ok=True)
    sweeps = {
        "mqar-mamba2-layers.yaml": {
            "base_config": "tasks/mqar/mqar-mamba2.yaml",
            "sweep": {"train": {"lr": [0.0001, 0.00046416, 0.00215443, 0.01]},
                      "model": {"num_layers": [1, 4]}},
        },
        "mqar-sm-attention-layers.yaml": {
            "base_config": "tasks/mqar/mqar-sm-attention.yaml",
            "sweep": {"train": {"lr": [0.0001, 0.00046416, 0.00215443, 0.01]},
                      "model": {"num_layers": [1, 4]}},
        },
        "mqar-sm-attention-seeds.yaml": {
            "base_config": "tasks/mqar/mqar-sm-attention.yaml",
            "sweep": {"seed": [1919, 2222, 2929, 1717]},
        },
        "mqar-lin-attention-seeds-lrs.yaml": {
            "base_config": "tasks/mqar/mqar-lin-attention.yaml",
            "sweep": {"seed": [1919, 2222, 2929, 1717],
                      "train": {"lr": [0.0001, 0.00046416, 0.00215443, 0.01]}},
        },
        "cifar-sm-attention-layers.yaml": {
            "base_config": "tasks/cifar/cifar-sm-attention.yaml",
            "sweep": {"model": {"num_layers": [2, 4, 6]}},
        },
    }
    for name, body in sweeps.items():
        with open(sdir / name, "w") as f:
            yaml.dump(body, f, sort_keys=False)

    n = len(list(Path("configs").rglob("*.yaml")))
    print(f"configs generated; total yaml files: {n}")


if __name__ == "__main__":
    main()
