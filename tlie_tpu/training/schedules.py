"""Learning-rate schedules and plateau decay (host-side pure functions).

Same schedule family as the reference (ref jax_helpers/train_helpers.py:16-68)
but fully functional: no in-place mutation of optimizer state — the computed
per-step values are injected into the jitted train step as dynamic scalars
(see ``training.state.set_group_learning_rates``), which keeps the whole
step compilable and makes the schedules usable inside vmapped mesh sweeps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def linear_warmup(step, base_lr, end_step, lr_min=None):
    return base_lr * (step + 1) / end_step


def cosine_annealing(step, base_lr, end_step, lr_min=1e-6):
    count = jnp.minimum(step, end_step)
    cosine_decay = 0.5 * (1 + jnp.cos(jnp.pi * count / end_step))
    return (base_lr - lr_min) * cosine_decay + lr_min


def constant_lr(step, base_lr, end_step, lr_min=None):
    return base_lr


class PlateauState(NamedTuple):
    """Carry for reduce-on-plateau (ref jax_helpers/train_helpers.py:50-68)."""

    lr: float
    ssm_lr: float
    count: int
    best: float


def reduce_lr_on_plateau(
    state: PlateauState, new_acc: float, factor=0.2, patience=20, lr_min=1e-6
) -> PlateauState:
    lr, ssm_lr, count, best = state
    if new_acc > best:
        count, best = 0, new_acc
    else:
        count += 1
    if count > patience:
        lr, ssm_lr, count = factor * lr, factor * ssm_lr, 0
    lr = max(lr, lr_min)
    ssm_lr = max(ssm_lr, lr_min)
    return PlateauState(lr, ssm_lr, count, best)


def schedule_for_step(step, warmup_steps, total_steps, cosine_anneal, lr, ssm_lr, lr_min):
    """Resolve the (lr, ssm_lr) pair for one step, reproducing the
    reference's warmup→cosine/constant selection (ref train.py:597-633)."""
    if warmup_steps and step < warmup_steps:
        fn, end = linear_warmup, warmup_steps
    elif cosine_anneal:
        fn, end = cosine_annealing, total_steps - (warmup_steps or 0)
    else:
        fn, end = constant_lr, None
    return float(fn(step, lr, end, lr_min)), float(fn(step, ssm_lr, end, lr_min))
