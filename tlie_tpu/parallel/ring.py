"""Ring attention: causal softmax attention across a sequence-sharded mesh.

Extends causal attention (ops/attention.py, replacing the reference's
single-GPU ``flash_attn_qkvpacked_func``, ref models/attention.py:37-55) to
contexts larger than one chip: queries, keys and values are sharded over a
``seq`` mesh axis; each device keeps its query block resident and the K/V
blocks rotate around the ring via ``lax.ppermute`` over ICI, one hop per
step, while an online softmax (running row-max m, normaliser l, and output
accumulator) folds each arriving block in — the flash-attention recurrence
at device granularity.

Causality: the block arriving at step ``s`` on device ``i`` is block
``j = (i - s) mod n``.  Blocks with ``j > i`` are fully masked (their
contribution is exp(-inf) = 0 — the compute is spent but never observed; a
striped layout would balance it, noted below), ``j == i`` applies the
intra-block causal mask, ``j < i`` is unmasked.  Accumulation is f32
regardless of input dtype.

Exactness: the online-softmax recurrence is algebraically the softmax, so
the result matches the single-device oracle up to float reassociation
(tested in tests/test_sp.py::test_ring_attention_*).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def _ring_block(q_blk, k_blk, v_blk, *, scale, axis_name):
    """Per-device ring loop.  q_blk/k_blk: (B, Lb, H, Dk), v_blk (B, Lb, H, Dv)."""
    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    B, Lb, H, Dv = v_blk.shape

    qf = q_blk.astype(jnp.float32)
    # initial accumulators must be marked varying over the mesh axis so the
    # fori_loop carry type matches the per-device outputs; pvary is
    # deprecated in favour of pcast(..., to="varying") — keep a fallback
    # shim for older JAX, mirroring the shard_map import shim below
    if hasattr(lax, "pcast"):
        vary = lambda x: lax.pcast(x, (axis_name,), to="varying")
    else:  # pragma: no cover - older JAX
        vary = lambda x: lax.pvary(x, (axis_name,))
    m0 = vary(jnp.full((B, Lb, H), -jnp.inf, jnp.float32))
    l0 = vary(jnp.zeros((B, Lb, H), jnp.float32))
    acc0 = vary(jnp.zeros((B, Lb, H, Dv), jnp.float32))
    rows = lax.broadcasted_iota(jnp.int32, (Lb, Lb), 0)
    cols = lax.broadcasted_iota(jnp.int32, (Lb, Lb), 1)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(s, carry):
        k_cur, v_cur, m, l, acc = carry
        j = (idx - s) % n
        scores = jnp.einsum(
            "bthd,bshd->bths", qf, k_cur.astype(jnp.float32) * scale
        )  # (B, Lb, H, Lb)
        allowed = jnp.where(
            j == idx, rows >= cols, jnp.broadcast_to(j < idx, (Lb, Lb))
        )  # (Lb_q, Lb_k)
        scores = jnp.where(
            allowed[None, :, None, :], scores, jnp.full((), -jnp.inf, scores.dtype)
        )
        m_new = jnp.maximum(m, scores.max(axis=-1))
        # fully-masked steps keep m = -inf; guard the exp against inf - inf
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(jnp.where(jnp.isfinite(scores), scores - safe_m[..., None], -jnp.inf))
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l = l * corr + p.sum(axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bths,bshd->bthd", p, v_cur.astype(jnp.float32)
        )
        k_cur = lax.ppermute(k_cur, axis_name, perm)
        v_cur = lax.ppermute(v_cur, axis_name, perm)
        return k_cur, v_cur, m_new, l, acc

    _, _, _, l, acc = lax.fori_loop(0, n, body, (k_blk, v_blk, m0, l0, acc0))
    # every query row attends at least to itself (j == idx diagonal) → l > 0
    return (acc / l[..., None]).astype(v_blk.dtype)


def ring_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    scale: Optional[float] = None,
    axis_name: str = "seq",
) -> jax.Array:
    """Causal softmax attention with (B, L, H, D) inputs whose L axis is
    sharded over ``mesh``'s ``axis_name``.  Same contract as
    ``ops.attention.causal_softmax_attention``; L must divide the axis size.
    Call under ``jax.jit``."""
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    if scale is None:
        scale = 1.0 / float(np.sqrt(q.shape[-1]))
    L = q.shape[1]
    n = mesh.shape[axis_name]
    if L % n != 0:
        raise ValueError(f"sequence length {L} not divisible by {axis_name} axis {n}")

    spec = P(None, axis_name)
    fn = shard_map(
        partial(_ring_block, scale=float(scale), axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
