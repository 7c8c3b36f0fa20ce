"""Conformance: every YAML under /root/reference/configs/iclr2026/** drives
this framework unchanged (VERDICT r1 item 5).

* 39 train configs: load + validate + build the model and shape-trace its
  init (jax.eval_shape — no FLOPs).
* 4 sweep configs: load via the CLI path (base_config resolved against the
  sweep file's own configs/ root) + Cartesian expansion.
* 5 analysis configs: parse with the expected keys.
"""

import os
from pathlib import Path

import jax
import jax.numpy as jnp
import pytest

REF_CFG = Path("/root/reference/configs/iclr2026")
pytestmark = pytest.mark.skipif(
    not REF_CFG.is_dir(), reason="reference configs not mounted"
)

from tlie_tpu.config import expand_sweep, load_experiment, load_sweep, load_yaml  # noqa: E402
from tlie_tpu.models.registry import build_models  # noqa: E402

TASK_DIRS = ("cifar", "imdb", "listops", "mqar", "wikitext")


def _train_configs():
    return sorted(p for d in TASK_DIRS for p in (REF_CFG / d).glob("*.yaml"))


def _seq_len(dataset_cfg: dict) -> int:
    """The l_max the launcher would derive from the built dataset
    (ref launch.py:148), computed statically per task family."""
    name = dataset_cfg["_name_"]
    if name == "mqar":
        return dataset_cfg["input_seq_length"]
    if name == "wikitext":
        return dataset_cfg["block_size"]
    return {"cifar": 1024, "listops": 2048, "imdb": 4096}[name]


def test_reference_train_config_count():
    assert len(_train_configs()) == 39


@pytest.mark.parametrize(
    "path", _train_configs(), ids=lambda p: f"{p.parent.name}/{p.stem}"
)
def test_reference_train_config_builds(path):
    cfg = load_experiment(path)  # parses + validates
    cfg.model["seq_len"] = _seq_len(cfg.dataset)
    padded = not cfg.dataset.get("fixed_size", True)
    train_model, eval_model, _ = build_models(cfg.model, padded)

    B = 2
    # int tokens iff the family's encoder is a token embedding: transformer
    # keys on ``embedding`` (models/transformer.py:141), mamba on
    # ``token_embedding`` (models/mamba2.py:261); SSM backbones take floats
    if cfg.model["layer"] == "mamba":
        as_int = cfg.model.get("token_embedding", False)
    elif cfg.model["layer"] == "transformer":
        as_int = cfg.model.get("embedding", False)
    else:
        as_int = False
    if as_int:
        dummy = jnp.zeros((B, cfg.model["seq_len"]), jnp.int32)
    else:
        dummy = jnp.ones((B, cfg.model["seq_len"], cfg.model["input_dim"]))
    if padded:
        dummy = (dummy, jnp.ones((B,)))
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    shapes = jax.eval_shape(lambda: eval_model.init(rngs, dummy))
    assert "params" in shapes


def test_reference_sweep_configs_resolve_and_expand():
    sweeps = sorted((REF_CFG / "sweep").rglob("*.yaml"))
    assert len(sweeps) == 4
    for path in sweeps:
        base, sweep = load_sweep(path)  # default config_root, as launch.py calls it
        points = expand_sweep(sweep)
        assert len(points) >= 2
        # every swept (section, param) path exists in the base config
        for sec_path, _ in points[0].items():
            section = sec_path[0]
            assert section in base.raw or section == "seed"


def test_reference_analysis_configs_parse():
    paths = sorted((REF_CFG / "analysis_configs").glob("*.yaml"))
    assert len(paths) == 5
    for path in paths:
        conf = load_yaml(path)
        assert "batch_size" in conf
