"""Artifact emission: .npy arrays, percentage text report, config snapshot.

Same artifact set and naming as the reference (ref analysis/eval_eig.py:393-459
and :750-851): eig / eig_init / 8 percentage arrays, a human-readable
``percentage_file.txt``, and the resolved config as YAML — written to a
local directory named after the run (and optionally attached to a W&B
artifact when configured).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np
import yaml

_ARTIFACT_KEYS = (
    "eig", "eig_init",
    "percentage", "percentage_init",
    "percentage_phase", "percentage_phase_init",
    "percentage_mean", "percentage_init_mean",
    "percentage_std", "percentage_init_std",
)


def write_percentage_file(
    path: str, thresholds_radius, percentage, percentage_init,
    percentage_mean=None, percentage_init_mean=None,
    percentage_std=None, percentage_init_std=None,
    batch_selection=(0, 2, 4, 6),
) -> None:
    """Per-(batch, head, layer) report for the attention/mamba families
    (ref eval_eig.py:393-433)."""
    num_heads = np.shape(percentage)[2]
    num_layers = np.shape(percentage)[3]
    batch_size = np.shape(percentage)[1]
    sel = [b for b in batch_selection if b < batch_size]

    with open(path, "w") as f:
        print("threshold radius:", thresholds_radius, "\n", file=f)
        print("batch selection:", np.array(sel), "\n", file=f)
        for bi, b in enumerate(sel):
            for h in range(num_heads):
                for l in range(num_layers):
                    print("percentage batch dimension", b, "head", h, "layer", l,
                          "radius init: ", np.round(percentage_init[:, b, h, l], 1), file=f)
                for l in range(num_layers):
                    print("percentage batch dimension", b, "head", h, "layer", l,
                          "radius: ", np.round(percentage[:, b, h, l], 1), file=f)
                if bi == 0 and percentage_mean is not None:
                    for l in range(num_layers):
                        print("percentage batch mean head", h, "layer", l,
                              "radius init: ", np.round(percentage_init_mean[:, h, l], 1), file=f)
                    for l in range(num_layers):
                        print("percentage batch mean head", h, "layer", l,
                              "radius: ", np.round(percentage_mean[:, h, l], 1), file=f)
                    for l in range(num_layers):
                        print("percentage batch std head", h, "layer", l,
                              "radius init: ", np.round(percentage_init_std[:, h, l], 1), file=f)
                    for l in range(num_layers):
                        print("percentage batch std head", h, "layer", l,
                              "radius: ", np.round(percentage_std[:, h, l], 1), file=f)
                print("\n", file=f)
            print("\n", file=f)


def write_percentage_file_ssm(
    path: str, thresholds_radius, thresholds_phase,
    percentage, percentage_init, percentage_phase, percentage_phase_init,
) -> None:
    """Per-layer report for the SSM families (ref eval_eig.py:435-459)."""
    num_layers = np.shape(percentage)[1]
    with open(path, "w") as f:
        print("threshold radius:", thresholds_radius, "\n", file=f)
        print("threshold phase:", thresholds_phase, "\n", file=f)
        for l in range(num_layers):
            print("percentage layer", l, "radius init: ",
                  np.round(percentage_init[:, l], 1), file=f)
        print("\n", file=f)
        for l in range(num_layers):
            print("percentage layer", l, "radius: ",
                  np.round(percentage[:, l], 1), file=f)
        print("\n", file=f)
        for l in range(num_layers):
            print("percentage layer", l, "phase init: ",
                  np.round(percentage_phase_init[:, l], 1), file=f)
        print("\n", file=f)
        for l in range(num_layers):
            print("percentage layer", l, "phase: ",
                  np.round(percentage_phase[:, l], 1), file=f)


def artifact_name(
    args: Dict[str, Any], perf: float, wandb_name: str = ""
) -> str:
    """Run-identifying artifact name (ref eval_eig.py:755-756, 811-812)."""
    model_config = args["model"]
    train_config = args["train"]
    data_config = args["dataset"]
    dim_conv = model_config.get("dim_conv", 0)
    return (
        f"{data_config.get('name', '')}{wandb_name}"
        f"dmodel{model_config['hidden_dim']}-seed{args.get('seed')}"
        f"-num_layers{model_config['num_layers']}-dqk{model_config['state_dim']}"
        f"-conv_dim{dim_conv}-lr{train_config['lr']}"
    )


def save_artifacts(
    out_dir: str,
    arrays: Dict[str, Any],
    args: Dict[str, Any],
    wandb_config: Optional[Dict[str, Any]] = None,
    name_model: str = "",
) -> str:
    """Write the 10 arrays + used_config.yaml (+ W&B artifact if configured)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for key in _ARTIFACT_KEYS:
        if key in arrays:
            p = os.path.join(out_dir, f"{key}.npy")
            np.save(p, np.asarray(arrays[key]))
            paths[key] = p

    cfg_path = os.path.join(out_dir, "used_config.yaml")
    with open(cfg_path, "w") as f:
        yaml.dump(_plain(args), f, default_flow_style=False, sort_keys=False)

    if wandb_config is not None:
        try:
            import wandb

            run = wandb.init(
                group="artifact_upload",
                entity=wandb_config.get("entity"),
                project=wandb_config.get("project"),
                name="upload" + name_model,
                job_type="add-dataset",
            )
            artifact = wandb.Artifact(name="eigen_values_" + name_model, type="dataset")
            for key, p in paths.items():
                artifact.add_file(local_path=p, name=f"{key}_{name_model}")
            artifact.add_file(local_path=cfg_path, name="used_config-" + name_model)
            txt = os.path.join(out_dir, "percentage_file.txt")
            if os.path.exists(txt):
                artifact.add_file(local_path=txt, name="percentage_file_" + name_model)
            artifact.save()
            run.finish()
        except Exception as exc:
            print(f"[analysis] W&B artifact upload unavailable ({exc}); saved locally")
    return out_dir


def _plain(obj):
    """Recursively convert frozen mappings/tuples back to YAML-dumpable types."""
    from collections.abc import Mapping

    if isinstance(obj, Mapping):
        return {k: _plain(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_plain(v) for v in obj]
    if isinstance(obj, (np.generic,)):
        return obj.item()
    return obj
