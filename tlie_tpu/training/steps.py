"""Jitted train / eval steps and batch preparation.

Single functional code path for every model family — the reference's
torch/JAX split (ref train.py:36-221 vs jax_helpers/train_helpers.py:236-389)
collapses into one jitted step.  Learning rates arrive as dynamic scalars
and are written into the optimizer state functionally, so nothing about the
step depends on host-side mutation and the same step vmaps across a sweep
mesh.

Loss: masked cross-entropy ignoring label −100 (the convention every task
here uses; the reference's torch branch got this from ``F.cross_entropy``'s
default ignore_index, its jax branch approximated it by zero one-hots —
this implementation masks properly in both shape regimes).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .state import set_group_learning_rates

IGNORE_IDX = -100


def cross_entropy_loss(logits, labels, ignore_idx: int = IGNORE_IDX):
    """Mean CE over non-ignored positions.

    logits (..., C) against integer labels (...,); positions whose label is
    ``ignore_idx`` contribute nothing (and don't dilute the mean).

    Formulated as logsumexp − gathered-logit rather than materialising the
    full log-softmax cube: on TPU the log_softmax+gather form costs 13×
    more HBM traffic through its backward pass (measured: 100 ms vs 7.7 ms
    for (64, 512, 8192) logits).
    """
    # bf16 logits (model compute_dtype=bfloat16) must reduce in f32: a 50k-way
    # logsumexp accumulated in bf16 loses ~2 decimal digits. XLA fuses the
    # cast into the reduction, so no f32 logits cube is materialised.
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    safe = jnp.maximum(labels, 0)
    lse = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, safe[..., None], axis=-1)[..., 0]
    ll = picked - lse
    mask = labels != ignore_idx
    return -jnp.sum(jnp.where(mask, ll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def compute_accuracy(logits, labels, ignore_idx: int = IGNORE_IDX):
    pred = jnp.argmax(logits, axis=-1)
    mask = labels != ignore_idx
    return jnp.sum(jnp.where(mask, pred == labels, False)) / jnp.maximum(
        jnp.sum(mask), 1
    )


def prep_batch(
    batch, seq_len: int, in_dim: int, lang_model: bool = False
) -> Tuple[Any, jax.Array]:
    """Standardise a loader batch to (inputs, labels) device arrays.

    Counterpart of ref jax_helpers/train_helpers.py:281-320 with one
    TPU-first change: integer token inputs are NOT one-hot expanded — the
    backbone's encoder takes the embedding-gather fast path instead, which
    is mathematically identical to Dense∘one_hot but never materialises the
    (B, L, vocab) cube.
    """
    if len(batch) == 2:
        inputs, targets = batch
        aux: Dict[str, Any] = {}
    else:
        inputs, targets, aux = batch

    inputs = jnp.asarray(inputs)
    targets = jnp.asarray(targets)
    lengths = aux.get("lengths") if isinstance(aux, dict) else None

    num_pad = seq_len - inputs.shape[1]
    if num_pad > 0:
        pad = [(0, 0), (0, num_pad)] + [(0, 0)] * (inputs.ndim - 2)
        inputs = jnp.pad(inputs, pad)

    if inputs.ndim < 3 and inputs.shape[-1] != in_dim:
        if not jnp.issubdtype(inputs.dtype, jnp.integer):
            inputs = jax.nn.one_hot(inputs, in_dim)
        # integer tokens pass through — encoder embeds them

    if lengths is not None and not lang_model and not np.isscalar(lengths):
        full_inputs = (inputs, jnp.asarray(lengths, dtype=jnp.float32))
    else:
        full_inputs = inputs
    return full_inputs, targets


@functools.partial(jax.jit, static_argnums=(5, 6))
def train_step(state, rng, inputs, labels, lrs, model, norm):
    """One optimization step; ``lrs`` is a dict of per-group learning rates
    written into the optimizer state before the update."""
    opt_state = set_group_learning_rates(state.opt_state, lrs)
    state = state.replace(opt_state=opt_state)

    def _loss(params):
        if norm == "batch":
            p = {"params": params, "batch_stats": state.batch_stats}
            logits, updates = model.apply(
                p, inputs, rngs={"dropout": rng}, mutable=["batch_stats"]
            )
        else:
            logits = model.apply({"params": params}, inputs, rngs={"dropout": rng})
            updates = None
        return cross_entropy_loss(logits, labels), updates

    (loss, updates), grads = jax.value_and_grad(_loss, has_aux=True)(state.params)
    if norm == "batch":
        state = state.apply_gradients(
            grads=grads, batch_stats=updates["batch_stats"]
        )
    else:
        state = state.apply_gradients(grads=grads)
    return state, loss


@functools.partial(jax.jit, static_argnums=(3, 4))
def eval_step(inputs, labels, state, model, norm):
    if norm == "batch":
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, inputs
        )
    else:
        logits = model.apply({"params": state.params}, inputs)
    loss = cross_entropy_loss(logits, labels)
    acc = compute_accuracy(logits, labels)
    return loss, acc, logits
