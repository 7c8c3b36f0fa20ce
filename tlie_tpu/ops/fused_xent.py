"""Fused decoder + softmax cross-entropy Pallas kernel.

The per-position LM loss dominates training step time once the recurrences
are fast: materialising (B·L, V) logits costs ~4 bytes × B·L·V of HBM
traffic three times (forward, logsumexp backward, gather backward).  This
kernel fuses the decoder matmul with an ONLINE softmax-cross-entropy: the
vocabulary is tiled through VMEM, running (max, sum-exp, picked-logit)
statistics live in scratch, and the full logits cube never exists.

Backward recomputes the softmax per vocab tile in two passes (one
accumulating dh with the vocab axis innermost, one accumulating dW/db with
the row axis innermost) — same recompute-over-materialise trade as flash
attention.

API: ``fused_softmax_xent(h, W, b, labels)`` → mean masked CE, with a
custom VJP for (h, W, b).  Shapes: h (M, D), W (D, V), b (V,), labels (M,)
with −100 ignored.  M must tile by 128; V may be ragged (e.g. GPT-2's
50257): the trailing partial vocab tile is masked to −1e30 inside the
kernel, so ragged vocabularies cost NO extra HBM traffic — no padded copy
of the (D, V) decoder weight is ever materialised (the weights change every
microstep of the scanned train block, so a padded copy could not be hoisted
out of the step; in-kernel masking removes the cost entirely).

Mixed precision: h/W/b may be bf16 — the MXU multiplies bf16 operands with
f32 accumulation (``preferred_element_type``), all online statistics, the
logsumexp and the loss stay f32, and the backward casts the (softmax −
onehot) factor to the operand dtype before its two matmuls (the same
recompute-in-low-precision trade flash attention makes).  Gradients are
returned in the primal dtypes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TV = 512   # vocab tile
IGNORE = -100

# Row tile: as large as the row count allows.  The (D, V) decoder weight is
# re-streamed once per row tile in the forward AND dh kernels, so the W
# traffic is (M / TM) · D · V — at GPT-2 LM shapes (M 8192, D 512, V 50257
# bf16) TM=128 re-reads ~6.6 GB of W per step while TM=1024 reads 0.8 GB.
# VMEM stays comfortable: the largest per-step residents are the (TM, TV)
# f32 logits tile (2 MB at 1024×512) and the (TM, D) f32 dh accumulator.
_TM_CANDIDATES = (1024, 512, 256, 128)


def _pick_tm(M: int) -> int:
    for tm in _TM_CANDIDATES:
        if M % tm == 0:
            return tm
    raise ValueError(f"row count {M} not tileable by 128")


def fused_xent_eligible(M: int, D: int, V: int) -> bool:
    # V needs no divisibility: a ragged trailing vocab tile is masked to
    # -1e30 in-kernel, contributing exp(-1e30 - m) = 0 to every statistic
    # and zero gradient
    return M % _TM_CANDIDATES[-1] == 0 and D <= 1024


def _num_v_tiles(V: int) -> int:
    return (V + _TV - 1) // _TV


def _col_mask(vj, v_actual: int, shape):
    """True for in-vocab columns of tile ``vj`` (the trailing tile of a
    ragged vocabulary reads out-of-bounds lanes whose contents are
    unspecified — they are masked before any statistic)."""
    col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return vj * _TV + col < v_actual


# ------------------------------------------------------------- forward


def _fwd_kernel(h_ref, w_ref, b_ref, y_ref, loss_ref, lse_ref,
                m_scr, s_scr, p_scr, *, v_actual):
    vj = pl.program_id(1)
    nv = pl.num_programs(1)

    @pl.when(vj == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, -1e30)
        s_scr[...] = jnp.zeros_like(s_scr)
        p_scr[...] = jnp.zeros_like(p_scr)

    logits = jnp.dot(h_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    logits = logits + b_ref[...]
    logits = jnp.where(_col_mask(vj, v_actual, logits.shape), logits, -1e30)

    m_old = m_scr[...]
    m_new = jnp.maximum(m_old, jnp.max(logits, axis=-1, keepdims=True))
    s_scr[...] = s_scr[...] * jnp.exp(m_old - m_new) + jnp.sum(
        jnp.exp(logits - m_new), axis=-1, keepdims=True
    )
    m_scr[...] = m_new

    # picked logit: label column falls in this tile?
    labels = y_ref[...]  # (TM, 1) int32
    loc = labels - vj * _TV
    col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    hit = col == loc
    p_scr[...] = p_scr[...] + jnp.sum(
        jnp.where(hit, logits, 0.0), axis=-1, keepdims=True
    )

    @pl.when(vj == nv - 1)
    def _():
        lse = m_scr[...] + jnp.log(s_scr[...])
        valid = labels != IGNORE
        loss_ref[...] = jnp.where(valid, lse - p_scr[...], 0.0)
        lse_ref[...] = lse


def _fwd(h, w, b, labels):
    M, D = h.shape
    V = w.shape[1]
    tm = _pick_tm(M)
    grid = (M // tm, _num_v_tiles(V))
    loss, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, v_actual=V),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, D), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _TV), lambda mi, vj: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TV), lambda mi, vj: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tm, 1), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
            jax.ShapeDtypeStruct((M, 1), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
            pltpu.VMEM((tm, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w, b.reshape(1, V), labels.reshape(M, 1).astype(jnp.int32))
    return loss[:, 0], lse[:, 0]


# ------------------------------------------------------------- backward
# dL/dlogits = (softmax(logits) − onehot(label)) · g_row
# dh = dlogits @ Wᵀ ;  dW = hᵀ @ dlogits ;  db = Σ_rows dlogits


def _dlogits(h_ref, w_ref, b_ref, y_ref, lse_ref, g_ref, vj, v_actual):
    logits = jnp.dot(h_ref[...], w_ref[...], preferred_element_type=jnp.float32)
    logits = logits + b_ref[...]
    logits = jnp.where(_col_mask(vj, v_actual, logits.shape), logits, -1e30)
    p = jnp.exp(logits - lse_ref[...])
    labels = y_ref[...]
    loc = labels - vj * _TV
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    onehot = (col == loc).astype(jnp.float32)
    valid = (labels != IGNORE).astype(jnp.float32)
    return (p - onehot) * g_ref[...] * valid


def _cast_for_dot(t, ref):
    """Backward matmul operand dtype: bf16 inputs do bf16×bf16 MXU passes
    (f32 accumulate); f32 inputs stay exact."""
    return t.astype(ref.dtype) if ref.dtype == jnp.bfloat16 else t


def _bwd_dh_kernel(h_ref, w_ref, b_ref, y_ref, lse_ref, g_ref, dh_ref, *, v_actual):
    vj = pl.program_id(1)
    t = _dlogits(h_ref, w_ref, b_ref, y_ref, lse_ref, g_ref, vj, v_actual)
    # t == 0 on out-of-vocab lanes, but the contraction still touches the
    # garbage w lanes (0·NaN = NaN) — zero them before the dot
    w_tile = jnp.where(
        _col_mask(vj, v_actual, w_ref.shape), w_ref[...], jnp.zeros((), w_ref.dtype)
    )
    contrib = jax.lax.dot_general(
        _cast_for_dot(t, w_tile), w_tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(vj == 0)
    def _():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    dh_ref[...] = dh_ref[...] + contrib


def _bwd_dw_kernel(h_ref, w_ref, b_ref, y_ref, lse_ref, g_ref, dw_ref, db_ref,
                   *, v_actual):
    mi = pl.program_id(1)  # rows innermost: dW tile revisited consecutively
    vj = pl.program_id(0)
    t = _dlogits(h_ref, w_ref, b_ref, y_ref, lse_ref, g_ref, vj, v_actual)
    contrib = jax.lax.dot_general(
        h_ref[...], _cast_for_dot(t, h_ref), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(mi == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] = dw_ref[...] + contrib
    db_ref[...] = db_ref[...] + jnp.sum(t, axis=0, keepdims=True)


def _bwd(h, w, b, labels, lse, g_rows):
    M, D = h.shape
    V = w.shape[1]
    nv = _num_v_tiles(V)
    tm = _pick_tm(M)
    y2 = labels.reshape(M, 1).astype(jnp.int32)
    lse2 = lse.reshape(M, 1)
    g2 = g_rows.reshape(M, 1)
    b2 = b.reshape(1, V)

    dh = pl.pallas_call(
        functools.partial(_bwd_dh_kernel, v_actual=V),
        grid=(M // tm, nv),
        in_specs=[
            pl.BlockSpec((tm, D), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _TV), lambda mi, vj: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TV), lambda mi, vj: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, D), lambda mi, vj: (mi, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w, b2, y2, lse2, g2)

    dw, db = pl.pallas_call(
        functools.partial(_bwd_dw_kernel, v_actual=V),
        grid=(nv, M // tm),
        in_specs=[
            pl.BlockSpec((tm, D), lambda vj, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D, _TV), lambda vj, mi: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TV), lambda vj, mi: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda vj, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda vj, mi: (mi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda vj, mi: (mi, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((D, _TV), lambda vj, mi: (0, vj), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TV), lambda vj, mi: (0, vj), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((D, V), jnp.float32),
            jax.ShapeDtypeStruct((1, V), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(h, w, b2, y2, lse2, g2)
    return dh, dw, db[0]


# ------------------------------------------------------------- public op


@jax.custom_vjp
def fused_softmax_xent(h, w, b, labels):
    """Mean masked softmax cross-entropy of ``h @ w + b`` against ``labels``
    without materialising the logits. Returns a scalar."""
    loss_rows, _ = _fwd(h, w, b, labels)
    n_valid = jnp.maximum(jnp.sum(labels != IGNORE), 1)
    return jnp.sum(loss_rows) / n_valid


def _vjp_fwd(h, w, b, labels):
    loss_rows, lse = _fwd(h, w, b, labels)
    n_valid = jnp.maximum(jnp.sum(labels != IGNORE), 1)
    return jnp.sum(loss_rows) / n_valid, (h, w, b, labels, lse, n_valid)


def _vjp_bwd(res, g):
    h, w, b, labels, lse, n_valid = res
    g_rows = jnp.full(labels.shape, g / n_valid.astype(jnp.float32))
    dh, dw, db = _bwd(h, w, b, labels, lse, g_rows)
    # cotangents must match the primal dtypes (bf16 inputs → bf16 grads)
    return dh.astype(h.dtype), dw.astype(w.dtype), db.astype(b.dtype), None


fused_softmax_xent.defvjp(_vjp_fwd, _vjp_bwd)
