"""Causal linear attention: cumulative KV-state update, chunked for the MXU.

TPU-native replacement for the ``fla.ops.simple_gla`` Triton kernels the
reference calls with ``g=None`` — i.e. an undecayed running KV state
(ref models/norm_attention.py:144-148) — and for the naive cumsum
formulation (ref models/attention.py:58-83).

The chunked form turns the O(L) recurrence into per-chunk matmuls:
  * intra-chunk: a (Q×Q)-masked attention matmul,
  * inter-chunk: each chunk's KV outer-product summary, prefix-summed, then
    contracted with the queries.
Everything is batched matmul → MXU; the only sequential structure is the
cheap prefix sum over L/Q chunk summaries.

Conventions: q, k are (B, L, H, Dk); v is (B, L, H, Dv); outputs (B, L, H, Dv).
The current timestep is included in the state (inclusive scan), matching both
reference paths.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_DEFAULT_CHUNK = 128


def recurrent_linear_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, scale: float = 1.0
) -> jax.Array:
    """Sequential oracle / decode path: S_t = S_{t-1} + scale·k_t v_tᵀ,
    o_t = S_tᵀ q_t.  Counterpart of ``fused_recurrent_simple_gla``."""
    k = k * scale

    def step(S, qkv_t):
        q_t, k_t, v_t = qkv_t  # (B, H, D*)
        S = S + k_t[..., :, None] * v_t[..., None, :]
        o_t = jnp.einsum("bhd,bhde->bhe", q_t, S)
        return S, o_t

    B, L, H, Dk = q.shape
    Dv = v.shape[-1]
    S0 = jnp.zeros((B, H, Dk, Dv), dtype=v.dtype)
    qs = jnp.moveaxis(q, 1, 0)
    ks = jnp.moveaxis(k, 1, 0)
    vs = jnp.moveaxis(v, 1, 0)
    _, os = lax.scan(step, S0, (qs, ks, vs))
    return jnp.moveaxis(os, 0, 1)


def chunked_linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float = 1.0,
    chunk: int = _DEFAULT_CHUNK,
    return_normalizer: bool = False,
    eps: Optional[float] = None,
):
    """Chunked causal linear attention (counterpart of ``chunk_simple_gla``
    with no decay).

    ``return_normalizer=True`` additionally returns n_t = q_t · Σ_{s≤t} k_s
    (the denominator of ref models/attention.py:77-79) as a (B, L, H) f32
    array, computed from the SAME chunked quantities the output already
    needs — the intra-chunk part is a row-sum of the masked score matrix,
    the inter-chunk part a contraction with the prefix k-sums (the Dv=1
    marginal of S_prefix) — so the standalone normalizer pass (a second
    qk matmul + an O(L) cumsum over the (B, L, H, Dk) keys) disappears.

    Under an active ``ops.scan.sequence_parallel`` context the computation
    routes to the seq-mesh version (parallel/sp.py): per-device chunked
    kernels + one ICI all-gather of KV-state (and k-sum) summaries."""
    from .scan import _SP_STATE

    if _SP_STATE is not None:
        from ..parallel.sp import sp_linear_attention

        mesh, axis_name = _SP_STATE
        return sp_linear_attention(
            q, k, v, mesh, scale=scale, axis_name=axis_name,
            return_normalizer=return_normalizer, eps=eps,
        )
    B, L, H, Dk = q.shape
    Dv = v.shape[-1]
    if L % chunk != 0:
        chunk = _pick_chunk(L, chunk)
    C = L // chunk

    k = k * scale
    qc = q.reshape(B, C, chunk, H, Dk)
    kc = k.reshape(B, C, chunk, H, Dk)
    vc = v.reshape(B, C, chunk, H, Dv)

    # Intra-chunk: causal masked attention within each chunk.
    att = jnp.einsum("bcihd,bcjhd->bchij", qc, kc)
    causal = jnp.tril(jnp.ones((chunk, chunk), dtype=bool))
    att = jnp.where(causal, att, jnp.zeros((), att.dtype))
    y_intra = jnp.einsum("bchij,bcjhe->bcihe", att, vc)

    # Inter-chunk: exclusive prefix sum of per-chunk KV summaries. The
    # running state accumulates in f32 even for bf16 inputs (the prefix sum
    # compounds rounding); the query contraction drops back to input dtype.
    S = jnp.einsum("bcjhd,bcjhe->bchde", kc, vc)
    S = S.astype(jnp.promote_types(S.dtype, jnp.float32))
    S_prefix = (jnp.cumsum(S, axis=1) - S).astype(q.dtype)  # exclusive
    y_inter = jnp.einsum("bcihd,bchde->bcihe", qc, S_prefix)

    y = (y_intra + y_inter).reshape(B, L, H, Dv)
    if not return_normalizer:
        return y

    f32 = jnp.promote_types(k.dtype, jnp.float32)
    if f32 == k.dtype:
        # f32 inputs: the materialised scores ARE full precision — reuse
        # them (free; summing att measured ~13% faster end-to-end than the
        # upcast-cumsum path at the lin-attention bench shapes)
        n_intra = att.sum(axis=-1)  # (B, C, H, Q_i): Σ_j masked q·k
        k_sum = kc.sum(axis=2)  # (B, C, H, Dk) per-chunk key totals
    else:
        # bf16 inputs: compute Σ_{j≤i} q_i·k_j as q_i · cumsum(k) from q/k
        # upcast to f32 — NOT by summing ``att`` (whose scores are already
        # rounded to bf16) — keeping the full-precision denominator the
        # standalone cumulative_key_normalizer promised
        k_incl = jnp.cumsum(kc.astype(f32), axis=2)  # inclusive within-chunk
        n_intra = jnp.einsum("bcihd,bcihd->bchi", qc.astype(f32), k_incl)
        k_sum = k_incl[:, :, -1]  # (B, C, H, Dk) per-chunk key totals
    k_prefix = jnp.cumsum(k_sum, axis=1) - k_sum  # exclusive
    n_inter = jnp.einsum("bcihd,bchd->bchi", qc.astype(f32), k_prefix)
    n = jnp.moveaxis(n_intra + n_inter, -1, 2).reshape(B, L, H)  # (B,C,Q,H)
    if eps is not None:
        n = jnp.where(n == 0, jnp.full((), eps, n.dtype), n)
    return y, n


def cumulative_key_normalizer(
    q: jax.Array, k: jax.Array, eps: Optional[float] = None
) -> jax.Array:
    """n_t = q_t · Σ_{s≤t} k_s — the linear-attention normalizer denominator
    (ref models/attention.py:77-79).  Returns (B, L, H) in f32: it divides
    the numerator, so bf16 inputs still get a full-precision denominator."""
    f32 = jnp.promote_types(k.dtype, jnp.float32)
    k_cum = jnp.cumsum(k.astype(f32), axis=1)
    n = jnp.einsum("blhd,blhd->blh", q.astype(f32), k_cum)
    if eps is not None:
        n = jnp.where(n == 0, jnp.full((), eps, n.dtype), n)
    return n


def _pick_chunk(L: int, preferred: int) -> int:
    for c in (preferred, 64, 32, 16, 8, 4, 2, 1):
        if c <= L and L % c == 0:
            return c
    return 1
