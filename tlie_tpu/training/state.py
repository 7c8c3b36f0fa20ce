"""Train-state construction: optax param groups + functional LR injection.

Mirrors the reference's optimizer policy (ref jax_helpers/train_helpers.py:86-231):
parameters named in ``ssm_lr_vars`` train with Adam at the SSM learning rate
and no weight decay; everything else with AdamW.  Both groups are built with
``optax.inject_hyperparams`` so their learning rates live in the optimizer
state, but unlike the reference — which mutates
``opt_state.inner_states[...].hyperparams`` in place from the host
(ref :41-46) — updates here are functional pytree surgery inside the jitted
step (``set_group_learning_rates``), so the whole step stays compilable and
vmappable across a sweep mesh.

A third factory covers the families that were torch-side in the reference
(Transformer / Mamba): single AdamW group + global-norm clipping at 1.0
(ref train.py:55-72,114-119) and an optional substring-matched parameter
group with its own LR stepped every ``update_step`` via gradient
accumulation (ref train.py:57-60,123-126).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.training import train_state


class TrainState(train_state.TrainState):
    batch_stats: Any = None


def map_nested_fn(fn):
    """Apply fn(key, value) at the leaves of a nested dict."""

    def map_fn(nested):
        return {
            k: (map_fn(v) if hasattr(v, "keys") else fn(k, v))
            for k, v in nested.items()
        }

    return map_fn


def _count_params(params) -> int:
    # complex params would count x2 in the reference; all params here are
    # real (pair-complex stored as real planes) so size is already faithful
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def _init_variables(model, rng, in_dim, batch_size, seq_len, padded, integer_inputs=False):
    if integer_inputs:
        dummy = jnp.zeros((batch_size, seq_len), dtype=jnp.int32)
    else:
        dummy = jnp.ones((batch_size, seq_len, in_dim))
    if padded:
        dummy = (dummy, jnp.ones((batch_size,)))
    init_rng, dropout_rng = jax.random.split(rng, num=2)
    return model.init({"params": init_rng, "dropout": dropout_rng}, dummy)


def _build_state(model, variables, tx, norm) -> Tuple[TrainState, Tuple[int, int]]:
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    nr_params = _count_params(params)
    encoder_params = params.get("encoder", {})
    if hasattr(encoder_params, "get") and "encoder" in encoder_params:
        # SSM backbone nests the Dense under encoder/encoder (ref counts that,
        # jax_helpers/train_helpers.py:122); attention families count the
        # whole embedding module (ref train.py:49)
        encoder_params = encoder_params["encoder"]
    nr_encoder = _count_params(encoder_params)
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=tx, batch_stats=batch_stats
    )
    return state, (nr_params, nr_encoder)


def _grouped_tx(ssm_vars: Sequence[str], ssm_lr, lr, weight_decay, betas,
                extra_groups: Optional[Dict[str, optax.GradientTransformation]] = None):
    groups = {
        "ssm": optax.inject_hyperparams(optax.adam)(
            learning_rate=ssm_lr, b1=betas[0], b2=betas[1]
        ),
        "regular": optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay, b1=betas[0], b2=betas[1]
        ),
    }
    if extra_groups:
        groups.update(extra_groups)

    ssm_set = set(ssm_vars)
    extra_names = set(extra_groups or ())

    def label(k, _):
        if k in ssm_set:
            return "ssm"
        for name in extra_names:
            if name in k:
                return name
        return "regular"

    return optax.multi_transform(groups, map_nested_fn(label))


def create_train_state(
    model_cls, rng, in_dim, batch_size, seq_len, weight_decay, norm,
    ssm_lr, ssm_vars, lr, padded, betas, integer_inputs=False,
):
    """Generic SSM-family state: groups from config ``ssm_lr_vars``
    (ref jax_helpers/train_helpers.py:161-231)."""
    model = model_cls(training=True) if callable(model_cls) and not hasattr(model_cls, "apply") else model_cls
    variables = _init_variables(model, rng, in_dim, batch_size, seq_len, padded, integer_inputs)
    tx = _grouped_tx(ssm_vars or [], ssm_lr, lr, weight_decay, betas)
    return _build_state(model, variables, tx, norm)


def create_train_state_s5(
    model_cls, rng, in_dim, batch_size, seq_len, weight_decay, norm,
    ssm_lr, ssm_vars, lr, padded, betas, integer_inputs=False,
):
    """S5 variant: hardcoded SSM param names plus a frozen 'none' group
    (ref jax_helpers/train_helpers.py:86-157)."""
    del ssm_vars
    model = model_cls(training=True) if callable(model_cls) and not hasattr(model_cls, "apply") else model_cls
    variables = _init_variables(model, rng, in_dim, batch_size, seq_len, padded, integer_inputs)
    # hardcoded SSM group + a zero-lr "none" group, mirroring the reference
    # state layout (ref jax_helpers/train_helpers.py:126-139)
    ssm_set = {"Lambda_re", "Lambda_im", "log_step", "norm"}
    groups = {
        "none": optax.inject_hyperparams(optax.adamw)(learning_rate=0.0),
        "ssm": optax.inject_hyperparams(optax.adam)(learning_rate=ssm_lr),
        "regular": optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay
        ),
    }
    label = map_nested_fn(lambda k, _: "ssm" if k in ssm_set else "regular")
    tx = optax.multi_transform(groups, label)
    return _build_state(model, variables, tx, norm)


def create_train_state_adamw(
    model, rng, in_dim, batch_size, seq_len, weight_decay, lr, betas,
    padded=False, integer_inputs=False, clip_norm: float = 1.0,
    param_group: Optional[str] = None, group_lr: float = 1e-3,
    update_step: int = 1,
):
    """Transformer/Mamba-family state (the reference's torch path,
    ref train.py:55-72): AdamW + global-norm clip, optional substring
    parameter group at its own LR applied every ``update_step`` steps."""
    variables = _init_variables(model, rng, in_dim, batch_size, seq_len, padded, integer_inputs)

    main = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, weight_decay=weight_decay, b1=betas[0], b2=betas[1]
        ),
    )
    if param_group is None:
        tx = _wrap_single_group(main)
    else:
        group = optax.MultiSteps(
            optax.inject_hyperparams(optax.adamw)(learning_rate=group_lr),
            every_k_schedule=update_step,
        )
        tx = optax.multi_transform(
            {"regular": main, "group": group},
            map_nested_fn(lambda k, _: "group" if param_group in k else "regular"),
        )
    return _build_state(model, variables, tx, None)


def _wrap_single_group(tx):
    """Wrap a lone transform as a one-group multi_transform so the LR
    injection helper sees a uniform state layout."""
    return optax.multi_transform({"regular": tx}, map_nested_fn(lambda k, _: "regular"))


def set_group_learning_rates(opt_state, lrs: Dict[str, jax.Array]):
    """Functionally write per-group learning rates into a multi_transform
    opt state built with inject_hyperparams.  The functional counterpart of
    the reference's in-place hyperparams mutation
    (ref jax_helpers/train_helpers.py:32-47)."""

    def fix_inner(inner):
        # inner may be a chain: find the InjectHyperparamsState leaf
        if hasattr(inner, "hyperparams") and "learning_rate" in inner.hyperparams:
            hp = dict(inner.hyperparams)
            hp["learning_rate"] = jnp.asarray(lrs[name], dtype=jnp.float32)
            return inner._replace(hyperparams=hp)
        if isinstance(inner, tuple) and not hasattr(inner, "_fields"):
            return tuple(fix_inner(x) for x in inner)
        if hasattr(inner, "_fields"):
            updated = {}
            changed = False
            for f in inner._fields:
                new_v = fix_inner(getattr(inner, f))
                updated[f] = new_v
                changed = changed or (new_v is not getattr(inner, f))
            return inner._replace(**updated) if changed else inner
        return inner

    new_inner_states = {}
    for name, masked in opt_state.inner_states.items():
        if name in lrs:
            new_inner_states[name] = fix_inner(masked)
        else:
            new_inner_states[name] = masked
    return opt_state._replace(inner_states=new_inner_states)
