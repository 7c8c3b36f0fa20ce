"""Run logging: W&B when configured, JSONL + stdout otherwise.

The reference logs to W&B whenever the config has a ``wandb`` section and
prints otherwise (ref train.py:717-726 and scattered wandb.log calls); this
keeps that switch while adding a local JSONL sink so headless runs always
leave a metrics trail.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


class RunLogger:
    def __init__(
        self,
        wandb_config: Optional[Dict[str, Any]] = None,
        run_name: str = "run",
        config: Optional[Dict[str, Any]] = None,
        log_dir: str = "./logs",
    ):
        self.run_name = run_name
        self._wandb = None
        self._file = None
        if wandb_config is not None:
            try:
                import wandb

                if "key" in wandb_config:
                    wandb.login(key=wandb_config["key"])
                wandb.init(
                    group=wandb_config.get("group"),
                    name=run_name,
                    entity=wandb_config.get("entity"),
                    project=wandb_config.get("project"),
                    config=config,
                    job_type="train",
                )
                self._wandb = wandb
            except Exception as exc:  # offline / unconfigured: fall back
                print(f"[logging] W&B unavailable ({exc}); logging locally")
        if self._wandb is None:
            os.makedirs(log_dir, exist_ok=True)
            safe = run_name.replace("/", "_")
            self._file = open(os.path.join(log_dir, f"{safe}.jsonl"), "a")

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        metrics = {k: _to_py(v) for k, v in metrics.items()}
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        else:
            rec = {"t": time.time(), "step": step, **metrics}
            self._file.write(json.dumps(rec) + "\n")
            self._file.flush()

    def summary(self, key: str, value: Any) -> None:
        if self._wandb is not None:
            self._wandb.run.summary[key] = _to_py(value)

    def finish(self) -> None:
        if self._wandb is not None:
            self._wandb.finish()
        if self._file is not None:
            self._file.close()


def _to_py(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v
