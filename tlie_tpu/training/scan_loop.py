"""On-device training blocks: lax.scan over many steps per dispatch.

The reference dispatches one optimizer step per host roundtrip
(ref train.py:87-212); on TPU that leaves the chip idle between RPCs.  Here
the entire (small) task dataset lives in HBM and a whole eval period of
training steps runs as ONE jitted ``lax.scan``:

  * batches are gathered from the device-resident dataset by a (K, B)
    index matrix drawn on host per block;
  * the learning-rate schedule is evaluated inside the graph (traced
    ``jnp.where`` warmup→cosine), with the plateau-decayed base rates as
    dynamic scalars;
  * dropout keys are folded from the step counter.

Evaluation is likewise one scanned dispatch over the test set.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .state import set_group_learning_rates
from .steps import cross_entropy_loss

# Dropout stream impl, captured ONCE at import (flipping the env var
# mid-process never affected already-traced blocks anyway — making the
# capture import-time makes that explicit).  ``rbg`` rides the TPU hardware
# RNG (~10× cheaper mask generation, see _rbg_key); note its bits are
# implementation-defined per backend/XLA version AND under vmap, so a CPU
# rerun — or a mesh-sweep rerun — of a TPU run with dropout>0 is not
# stream-identical.  ``TLIE_DROPOUT_RNG=threefry`` restores the fully
# deterministic, vmap-consistent stream.
import os as _os

_DROPOUT_RNG_IMPL = _os.environ.get("TLIE_DROPOUT_RNG", "rbg")


class DeviceData(NamedTuple):
    inputs: jax.Array        # (N, L) tokens or (N, L, D) features
    labels: jax.Array        # (N,) or (N, L)
    lengths: Optional[jax.Array] = None  # (N,) for padded tasks


def put_dataset(
    inputs: np.ndarray,
    labels: np.ndarray,
    lengths: Optional[np.ndarray] = None,
    sharding=None,
) -> DeviceData:
    """Move a whole split to device (once)."""

    def _put(x):
        if x is None:
            return None
        x = x.astype(np.int32) if np.issubdtype(x.dtype, np.integer) else x.astype(np.float32)
        return jax.device_put(x, sharding) if sharding is not None else jnp.asarray(x)

    return DeviceData(_put(inputs), _put(labels), _put(lengths))


def _traced_lr(step, base_lr, warmup: int, total: int, cosine: bool, lr_min: float):
    """Warmup→cosine/constant schedule, branch-free for use inside lax.scan
    (same formulas as training.schedules / ref train_helpers.py:16-29)."""
    step = step.astype(jnp.float32)
    warm = base_lr * (step + 1) / jnp.maximum(warmup, 1)
    if cosine:
        end = max(total - warmup, 1)
        count = jnp.minimum(step, end)
        decay = 0.5 * (1 + jnp.cos(jnp.pi * count / end))
        after = (base_lr - lr_min) * decay + lr_min
    else:
        after = base_lr * jnp.ones_like(step)
    return jnp.where(step < warmup, warm, after)


def _rbg_key(rng):
    """Dropout base key on the TPU hardware RNG (``rbg`` impl).

    Generating a Bernoulli mask for a (64, 512, 128) activation with the
    default threefry stream measured ~2 ms per application on chip
    (tools/profile_lin_block_ops.py, round 4) — the single most expensive
    op in the lin-attention block.  The XLA RngBitGenerator path is ~an
    order of magnitude cheaper.  The dropout STREAM is not a parity
    surface (the reference's torch stream differs anyway); only the
    Bernoulli(1−p) marginal matters, which is identical."""
    if _DROPOUT_RNG_IMPL != "rbg":
        # A/B escape hatch: TLIE_DROPOUT_RNG=threefry restores the original
        # stream (captured at module import).  Marginal MQAR points can flip
        # under a different dropout stream — the recall transition is sharp
        return rng
    data = rng if rng.dtype == jnp.uint32 else jax.random.key_data(rng)
    return jax.random.wrap_key_data(
        jnp.tile(data.reshape(-1), 2)[:4].astype(jnp.uint32), impl="rbg"
    )


def sparse_head_k_for(
    model_cfg, train_labels, test_labels=None
) -> Optional[int]:
    """Gate + K for the sparse decoder head, shared by the training loop,
    the mesh sweep and bench (one source of truth — the three call sites
    previously drifted).

    Returns the number of feature positions to gather before the decoder
    matmul, or ``None`` when the head doesn't apply.  Applies only to
    per-position decoders (transformer ignores pooling when
    ``classifier=False``, ref models/transformer.py:149-161; mamba/SSM
    backbones are per-position only with ``pooling: none``), with 2-D
    ``(B, L)`` labels that are ≥4× sparse in non-ignored (−100) entries.

    K is the max valid count over BOTH splits: eval gathers top-K positions
    from *test* labels, so a test row denser than the train max would
    silently drop label positions from the metric if K came from the train
    split alone."""
    per_pos = (
        not model_cfg.get("classifier", False)
        and not model_cfg.get("dual", False)
        and (
            model_cfg.get("layer") == "transformer"
            or model_cfg.get("pooling") == "none"
        )
    )
    if not per_pos:
        return None
    tr = np.asarray(train_labels)
    if tr.ndim != 2:
        return None
    kmax = int((tr != -100).sum(axis=1).max())
    if test_labels is not None:
        te = np.asarray(test_labels)
        if te.ndim == 2:
            if te.shape[1] != tr.shape[1]:
                return None
            kmax = max(kmax, int((te != -100).sum(axis=1).max()))
    return kmax if 0 < kmax * 4 <= tr.shape[1] else None


def _gather_batch(data: DeviceData, idx_t):
    x = jnp.take(data.inputs, idx_t, axis=0)
    y = jnp.take(data.labels, idx_t, axis=0)
    if data.lengths is not None:
        x = (x, jnp.take(data.lengths, idx_t, axis=0))
    return x, y


def _shard_batch(x, y, mesh):
    """Constrain the gathered batch to be sharded over the mesh's ``data``
    axis (params stay replicated, so XLA inserts the gradient all-reduce —
    the 1-D data-parallel scheme of SURVEY.md §2.4)."""
    if mesh is None:
        return x, y
    from jax.sharding import NamedSharding, PartitionSpec as P

    ns = NamedSharding(mesh, P("data"))
    c = lambda a: jax.lax.with_sharding_constraint(a, ns)
    x = (c(x[0]), c(x[1])) if isinstance(x, tuple) else c(x)
    return x, c(y)


def make_train_block(
    model,
    norm: str,
    group_names: Tuple[str, ...],
    warmup: int,
    total_steps: int,
    cosine: bool,
    lr_min: float,
    group_lr: float = 1e-3,
    fused_head: bool = False,
    mesh=None,
    fused_head_dtype=None,
    sparse_head_k: Optional[int] = None,
    sp_mesh=None,
):
    """Build a jitted runner for K on-device training steps.

    Returned callable: (state, rng, DeviceData, idx (K, B), step0, lr, ssm_lr)
    → (state, mean_loss).

    ``fused_head=True`` routes the loss through the fused decoder+softmax-CE
    Pallas kernel (ops/fused_xent.py): the model's ``features`` method feeds
    the kernel together with the decoder params, and the (B·L, vocab) logits
    cube never materialises.  ``fused_head_dtype=jnp.bfloat16`` (the
    compute_dtype mode) runs the kernel's matmuls on bf16 operands with f32
    accumulation; the autodiff cast returns f32 param gradients.

    ``sparse_head_k=K`` enables the sparse decoder head for tasks whose
    (B, L) labels are mostly ``-100`` (MQAR: 64 query positions out of 512,
    ref dataloaders/mqar.py:83-135): the K valid positions per row are
    gathered from the backbone features BEFORE the decoder matmul, so the
    vocab path (decoder matmuls + logits traffic + CE) shrinks by L/K.
    Positions whose label is ignored have exactly zero gradient through the
    logits, so this is the identical loss and identical gradients — K must
    be an upper bound on valid labels per row (the caller verifies against
    the dataset).  Mutually exclusive with ``fused_head``; per-position
    decoders only (no pooling/classifier/dual).

    ``sp_mesh``: a ``seq``-axis mesh — the model's recurrences
    (diag_linear_scan call sites: LRU/S5 scans, Mamba-1 selective scan) are
    traced inside ``ops.scan.sequence_parallel``, splitting the TIME axis
    across devices with one ICI all-gather of per-shard state summaries
    (parallel/sp.py).  The config knob is ``train.sequence_parallel: N``.
    """
    if sparse_head_k is not None and fused_head:
        raise ValueError("sparse_head_k is mutually exclusive with fused_head")

    import contextlib

    def _sp_ctx():
        if sp_mesh is None:
            return contextlib.nullcontext()
        from ..ops.scan import sequence_parallel

        return sequence_parallel(sp_mesh)

    def _sparse_loss(params, batch_stats, x, y, drop_rng):
        if norm == "batch":
            p = {"params": params, "batch_stats": batch_stats}
            feats, updates = model.apply(
                p, x, rngs={"dropout": drop_rng}, mutable=["batch_stats"],
                method=type(model).features,
            )  # (B, L, d)
        else:
            feats = model.apply(
                {"params": params}, x, rngs={"dropout": drop_rng},
                method=type(model).features,
            )
            updates = None
        valid = y != -100
        # top_k on the 0/1 mask → the (sorted) indices of the valid
        # positions first (ties break toward lower index), then — if a row
        # has fewer than K valid — leading invalid positions, whose labels
        # are -100 and thus masked inside cross_entropy_loss: the selected
        # valid set is exactly the full valid set, so loss and grads match
        # the dense head bit-for-bit up to matmul tiling
        _, pos = lax.top_k(valid.astype(jnp.int32), sparse_head_k)  # (B, K)
        f_sel = jnp.take_along_axis(feats, pos[..., None], axis=1)
        y_sel = jnp.take_along_axis(y, pos, axis=1)
        dec = params["decoder"]
        w = dec["kernel"].astype(f_sel.dtype)  # flax Dense dtype semantics
        logits = f_sel @ w
        if "bias" in dec:
            logits = logits + dec["bias"].astype(f_sel.dtype)
        return cross_entropy_loss(logits, y_sel), updates

    def _fused_loss(params, x, y, drop_rng):
        from ..ops.fused_xent import fused_softmax_xent

        feats = model.apply(
            {"params": params}, x, rngs={"dropout": drop_rng},
            method=type(model).features,
        )
        d = feats.shape[-1]
        dec = params["decoder"]
        w = dec["kernel"]
        b = dec.get("bias")
        if b is None:
            b = jnp.zeros((w.shape[1],), feats.dtype)
        if fused_head_dtype is not None:
            feats = feats.astype(fused_head_dtype)
            w = w.astype(fused_head_dtype)
            b = b.astype(fused_head_dtype)
        return fused_softmax_xent(
            feats.reshape(-1, d), w, b, y.reshape(-1)
        )

    # donating the carried train state lets XLA update params/opt-moments
    # in place across the scan instead of double-buffering ~3× params of
    # HBM (f32 params + Adam mu/nu ≈ 730 MB at the 61M WikiText model) —
    # every caller rebinds the returned state, so the old buffers are dead
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_block(state, rng, data: DeviceData, idx, step0, lr, ssm_lr):
        drop_base = _rbg_key(rng)

        def step_body(carry, idx_t):
            state, step = carry
            x, y = _gather_batch(data, idx_t)
            x, y = _shard_batch(x, y, mesh)

            lrs = {}
            if "regular" in group_names:
                lrs["regular"] = _traced_lr(step, lr, warmup, total_steps, cosine, lr_min)
            if "ssm" in group_names:
                lrs["ssm"] = _traced_lr(step, ssm_lr, warmup, total_steps, cosine, lr_min)
            if "group" in group_names:
                lrs["group"] = jnp.asarray(group_lr, jnp.float32)

            state = state.replace(
                opt_state=set_group_learning_rates(state.opt_state, lrs)
            )
            drop_rng = jax.random.fold_in(drop_base, step)

            def _loss(params):
                if fused_head:
                    return _fused_loss(params, x, y, drop_rng), None
                if sparse_head_k is not None:
                    return _sparse_loss(
                        params, state.batch_stats if norm == "batch" else None,
                        x, y, drop_rng,
                    )
                if norm == "batch":
                    p = {"params": params, "batch_stats": state.batch_stats}
                    logits, updates = model.apply(
                        p, x, rngs={"dropout": drop_rng}, mutable=["batch_stats"]
                    )
                else:
                    logits = model.apply(
                        {"params": params}, x, rngs={"dropout": drop_rng}
                    )
                    updates = None
                return cross_entropy_loss(logits, y), updates

            with _sp_ctx():
                (loss, updates), grads = jax.value_and_grad(_loss, has_aux=True)(
                    state.params
                )
            if norm == "batch":
                state = state.apply_gradients(
                    grads=grads, batch_stats=updates["batch_stats"]
                )
            else:
                state = state.apply_gradients(grads=grads)
            return (state, step + 1), loss

        (state, _), losses = jax.lax.scan(step_body, (state, step0), idx)
        return state, jnp.mean(losses)

    def call(state, rng, data: DeviceData, idx, step0: int, lr: float, ssm_lr: float):
        return run_block(
            state, rng, data,
            jnp.asarray(idx, jnp.int32), jnp.asarray(step0, jnp.int32),
            jnp.asarray(lr, jnp.float32), jnp.asarray(ssm_lr, jnp.float32),
        )

    return call


def make_eval_block(
    model, norm: str, metrics_fn: Callable, mesh=None,
    sparse_head_k: Optional[int] = None, sp_mesh=None,
):
    """Build a jitted scanned evaluation over (n_batches, B)-indexed test
    data → (mean_loss, mean_metric).

    ``sparse_head_k``: same sparse decoder head as make_train_block — CE and
    the masked metrics (accuracy/perplexity) reduce over exactly the valid
    label positions, so evaluating only the gathered ≤K positions per row is
    the identical number.  ``sp_mesh``: see make_train_block."""
    import contextlib

    def _sp_ctx():
        if sp_mesh is None:
            return contextlib.nullcontext()
        from ..ops.scan import sequence_parallel

        return sequence_parallel(sp_mesh)

    @jax.jit
    def run_eval(state, data: DeviceData, idx):
        def eval_body(_, idx_t):
            x, y = _gather_batch(data, idx_t)
            x, y = _shard_batch(x, y, mesh)
            variables = (
                {"params": state.params, "batch_stats": state.batch_stats}
                if norm == "batch" else {"params": state.params}
            )
            if sparse_head_k is not None:
                with _sp_ctx():
                    feats = model.apply(
                        variables, x, method=type(model).features
                    )
                valid = y != -100
                _, pos = lax.top_k(valid.astype(jnp.int32), sparse_head_k)
                f_sel = jnp.take_along_axis(feats, pos[..., None], axis=1)
                y = jnp.take_along_axis(y, pos, axis=1)
                dec = state.params["decoder"]
                logits = f_sel @ dec["kernel"].astype(f_sel.dtype)
                if "bias" in dec:
                    logits = logits + dec["bias"].astype(f_sel.dtype)
            else:
                with _sp_ctx():
                    logits = model.apply(variables, x)
            return None, (cross_entropy_loss(logits, y), metrics_fn(logits, y))

        _, (losses, metrics) = jax.lax.scan(eval_body, None, idx)
        return jnp.mean(losses), jnp.mean(metrics)

    def call(state, data: DeviceData, idx):
        return run_eval(state, data, jnp.asarray(idx, jnp.int32))

    return call


def batch_indices(
    rng: np.random.Generator, n: int, batch_size: int, k_steps: int
) -> np.ndarray:
    """(k_steps, batch_size) sample indices: epoch-shuffled without
    replacement, re-permuted across epoch boundaries."""
    out = np.empty((k_steps, batch_size), dtype=np.int32)
    produced = 0
    while produced < k_steps:
        order = rng.permutation(n)
        n_batches = n // batch_size
        take = min(n_batches, k_steps - produced)
        out[produced : produced + take] = order[: take * batch_size].reshape(
            take, batch_size
        )
        produced += take
    return out


def eval_indices(n: int, batch_size: int) -> np.ndarray:
    n_batches = max(1, n // batch_size)
    return np.arange(n_batches * batch_size, dtype=np.int32).reshape(
        n_batches, batch_size
    )
