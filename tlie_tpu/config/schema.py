"""Experiment configuration: YAML schema, sweep expansion, derived fields.

Schema parity with the reference repo (see SURVEY.md §5; ref ``launch.py:69-148``):
a config file is a mapping with top-level scalars ``seed`` / ``save`` and
sections ``dataset`` / ``train`` / ``model`` (optional ``wandb`` /
``optimization``).  Sweep files hold ``base_config`` plus a ``sweep`` mapping
of either ``section: [values]`` (the whole section value is swept — used for
top-level scalars like ``seed``) or ``section: {param: [values]}``; all listed
value lists are combined by Cartesian product (ref ``launch.py:19-49``).

Reference configs are parseable as-is: ``load_experiment`` accepts any path
to a reference-format YAML.
"""

from __future__ import annotations

import copy
import dataclasses
import itertools
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import yaml

# Dataset names whose tasks are next-token style ("language model" tasks):
# loss is dense over time and step-driven training is used.
# Ref: launch.py:119.
LANG_MODEL_DATASETS = ("WikiText", "MQAR")

# Model families implemented by this framework (ref train.py:732-743).
MODEL_FAMILIES = ("mamba", "transformer", "lru", "s4", "s5")


def load_yaml(path: str | Path) -> Dict[str, Any]:
    with open(path) as stream:
        data = yaml.safe_load(stream)
    if not isinstance(data, dict):
        raise ValueError(f"Config {path} did not parse to a mapping")
    return data


@dataclasses.dataclass
class ExperimentConfig:
    """A single experiment point: raw dict sections plus derived fields.

    Stays dict-backed so arbitrary reference YAML keys round-trip unchanged,
    but exposes the handful of derived fields the launcher computes at
    runtime (ref launch.py:119,141-148).
    """

    raw: Dict[str, Any]

    # -- section accessors -------------------------------------------------
    @property
    def seed(self) -> int:
        return int(self.raw.get("seed", 0))

    @property
    def save(self) -> Optional[str]:
        return self.raw.get("save")

    @property
    def dataset(self) -> Dict[str, Any]:
        return self.raw["dataset"]

    @property
    def train(self) -> Dict[str, Any]:
        return self.raw["train"]

    @property
    def model(self) -> Dict[str, Any]:
        return self.raw["model"]

    @property
    def wandb(self) -> Optional[Dict[str, Any]]:
        return self.raw.get("wandb")

    # -- derived fields -----------------------------------------------------
    @property
    def layer(self) -> str:
        return self.model["layer"]

    @property
    def lang_model(self) -> bool:
        return self.dataset.get("name") in LANG_MODEL_DATASETS

    @property
    def is_torch_family(self) -> bool:
        """Families that were torch in the reference (all flax here); kept
        because train-loop selection and analysis branch on it."""
        return self.layer in ("mamba", "transformer")

    def validate(self) -> "ExperimentConfig":
        for section in ("dataset", "train", "model"):
            if section not in self.raw:
                raise ValueError(f"Config missing required section '{section}'")
        if self.layer not in MODEL_FAMILIES:
            raise ValueError(
                f"model.layer={self.layer!r} not in {MODEL_FAMILIES}"
            )
        return self

    def derive_runtime_fields(self, dataset) -> "ExperimentConfig":
        """Fill fields the launcher derives from the dataset once it is built.

        Ref launch.py:119 (lang_model), :141-148 (padded, train_size, seq_len).
        """
        self.raw["lang_model"] = self.lang_model
        if "fixed_size" in self.dataset:
            self.train["padded"] = not self.dataset["fixed_size"]
        else:
            self.train["padded"] = False
        self.train["train_size"] = len(dataset.train_inputs)
        self.model["seq_len"] = dataset.l_max
        return self

    def copy(self) -> "ExperimentConfig":
        return ExperimentConfig(copy.deepcopy(self.raw))

    def checkpoint_name(self) -> Optional[str]:
        """Checkpoint path stem embedding the run hyperparameters.

        Ref train.py:711-715 (name embeds seed / layers / conv dim / state dim).
        """
        if self.save is None:
            return None
        dim_conv = self.model.get("dim_conv", 0)
        return (
            f"{self.save}-seed-{self.seed}-layers-{self.model['num_layers']}"
            f"dim_conv{dim_conv}-s_d-{self.model['state_dim']}"
        )


def load_experiment(path: str | Path) -> ExperimentConfig:
    return ExperimentConfig(load_yaml(path)).validate()


def load_sweep(path: str | Path, config_root: str | Path = "configs") -> Tuple[ExperimentConfig, Dict[str, Any]]:
    """Load a sweep file: returns (base experiment config, sweep mapping).

    ``base_config`` is resolved like the reference (ref launch.py:77-86,
    relative to the configs root), trying in order: ``config_root``, the
    sweep file's own directory, and — so reference sweep files work from any
    checkout unchanged — the sweep file's nearest ``configs/`` ancestor
    (e.g. ``.../configs/iclr2026/sweep/mqar/...`` resolves ``base_config:
    iclr2026/mqar/x.yaml`` against ``.../configs/``).
    """
    sweep_cfg = load_yaml(path)
    base_rel = sweep_cfg["base_config"]
    candidates = [Path(config_root) / base_rel, Path(path).parent / base_rel]
    for ancestor in Path(path).resolve().parents:
        if ancestor.name == "configs":
            candidates.append(ancestor / base_rel)
    base_path = next((c for c in candidates if c.exists()), candidates[0])
    return load_experiment(base_path), sweep_cfg["sweep"]


def expand_sweep(sweep: Dict[str, Any]) -> List[Dict[str, Any]]:
    """Expand a sweep mapping into a list of flat override dicts.

    Each override maps a ``(section, param)`` path — or ``(section,)`` for
    whole-section sweeps like ``seed`` — to one concrete value.  The list is
    the Cartesian product over all swept parameters, in the same order as the
    reference's ``itertools.product`` expansion (ref launch.py:19-36).
    """
    paths: List[Tuple[str, ...]] = []
    value_lists: List[Sequence[Any]] = []
    for section, spec in sweep.items():
        if isinstance(spec, list):
            paths.append((section,))
            value_lists.append(spec)
        elif isinstance(spec, dict):
            for param, values in spec.items():
                if not isinstance(values, list):
                    raise ValueError(
                        "Sweep values must be lists "
                        f"(got {type(values).__name__} for {section}.{param})"
                    )
                paths.append((section, param))
                value_lists.append(values)
        else:
            raise ValueError(f"Sweep section {section!r} must be a list or dict")

    points = []
    for combo in itertools.product(*value_lists):
        points.append({path: value for path, value in zip(paths, combo)})
    return points


def apply_sweep_point(
    base: ExperimentConfig, point: Dict[Tuple[str, ...], Any]
) -> ExperimentConfig:
    """Return a deep-copied config with one sweep point applied.

    Ref launch.py:38-49 (update_args) + :169-170 (deepcopy per point).
    """
    cfg = base.copy()
    for path, value in point.items():
        if len(path) == 1:
            cfg.raw[path[0]] = value
        else:
            section, param = path
            cfg.raw[section][param] = value
    return cfg


def iter_sweep(base: ExperimentConfig, sweep: Dict[str, Any]) -> Iterator[ExperimentConfig]:
    for point in expand_sweep(sweep):
        yield apply_sweep_point(base, point)
