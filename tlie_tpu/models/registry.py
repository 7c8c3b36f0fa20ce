"""Model registry: config dict → flax model instances.

The reference dispatches on ``model.layer`` strings at train.py:728-743;
this registry reproduces that contract for all six families, returning
(train-mode model, eval-mode model, family tag).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ..utils.freeze import freeze_config
from .backbone import BatchClassificationModel
from .lru import init_LRU
from .mamba2 import Mamba
from .s4 import init_S4
from .s5 import init_S5
from .transformer import Transformer

SSM_FAMILIES = ("lru", "s4", "s5")
ATTENTION_FAMILIES = ("mamba", "transformer")


def ssm_backbone_partial(model_config: Dict[str, Any], padded: bool):
    """Build the BatchClassificationModel partial for an SSM family
    (ref train.py:393-412)."""
    layer = model_config["layer"]
    init_fn = {"lru": init_LRU, "s4": init_S4, "s5": init_S5}[layer]
    ssm = init_fn(model_config["state_dim"], model_config["hidden_dim"], **model_config)
    return partial(
        BatchClassificationModel,
        ssm=ssm,
        d_output=model_config["output_dim"],
        d_model=model_config["hidden_dim"],
        n_layers=model_config["num_layers"],
        activation=model_config["activation"],
        dropout=model_config["dropout"],
        pooling=model_config["pooling"],
        prenorm=model_config["prenorm"],
        norm=model_config["norm"],
        padded=padded,
        d_input=model_config["input_dim"],
        # CE/argmax/perplexity are invariant to the reference's final
        # log_softmax; skipping it removes a ~100ms backward at LM shapes
        logits_output=True,
        # opt-in bf16 mixed precision for the backbone matmuls; the SSM
        # core always computes f32 (see backbone.py / README)
        dtype=(
            jnp.bfloat16
            if model_config.get("compute_dtype") == "bfloat16"
            else None
        ),
    )


def build_models(model_config: Dict[str, Any], padded: bool) -> Tuple[Any, Any, str]:
    """Returns (train_model, eval_model, family)."""
    layer = model_config["layer"]
    if layer in SSM_FAMILIES:
        mk = ssm_backbone_partial(model_config, padded)
        return mk(training=True), mk(training=False), layer
    if layer == "transformer":
        frozen = freeze_config(model_config)
        return (
            Transformer(cfg=frozen, deterministic=False),
            Transformer(cfg=frozen, deterministic=True),
            layer,
        )
    if layer == "mamba":
        frozen = freeze_config(model_config)
        return (
            Mamba(cfg=frozen, deterministic=False),
            Mamba(cfg=frozen, deterministic=True),
            layer,
        )
    raise RuntimeError(f"{layer} is not a valid model option")
