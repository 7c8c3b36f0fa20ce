"""Sequence parallelism: the diagonal linear scan across a device mesh.

The reference's parallelism over *time* stops at one device (associative
scan / chunked kernels, SURVEY.md §2.2); sequences longer than one chip's
HBM have no story.  This module extends the LRU/S5 recurrence
``h_t = a_t * h_{t-1} + b_t`` (ops/scan.py) across a ``seq`` mesh axis —
the device-level analogue of the chunk decomposition the kernels already
use in VMEM:

  1. each device runs the combine-based associative scan on its own time
     shard, producing inclusive per-step states H and decay products A;
  2. per-shard summaries (A_last, H_last) are all-gathered over ICI — the
     only communication, O(n_devices · state) bytes;
  3. an exclusive cross-device combine of the summaries yields each shard's
     incoming carry, applied as ``H_t += A_t * h_in`` locally.

Complex recurrences travel as (re, im) pairs (the TPU backend has no
complex dtype — see ops/scan.py); the cross-device combine runs the same
pair arithmetic.  Exact: the fix-up is algebraically the scan identity, so
the result equals the single-device scan up to float reassociation.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.scan import _combine_pair, _combine_real, _is_pair
from ..utils import cplx

ArrayOrPair = Union[jax.Array, Tuple[jax.Array, jax.Array]]


def seq_mesh(n_devices: Optional[int] = None, axis: str = "seq") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"sequence_parallel={n} requested but only {len(devs)} device(s) "
            "are visible"
        )
    return Mesh(np.asarray(devs[:n]), (axis,))


def _carry_in(A, H, combine, axis, axis_name):
    """Exclusive cross-device combine of per-shard summaries → this shard's
    incoming state.  A/H are the local inclusive scan outputs."""
    take_last = lambda x: lax.index_in_dim(x, -1, axis, keepdims=False)
    summaries = tuple(lax.all_gather(take_last(x), axis_name) for x in (*A, *H))
    pref = lax.associative_scan(combine, summaries, axis=0)
    idx = lax.axis_index(axis_name)
    prev = jnp.maximum(idx - 1, 0)
    n = len(A)
    h_in = tuple(
        jnp.where(
            idx == 0,
            jnp.zeros_like(p[0]),
            lax.dynamic_index_in_dim(p, prev, 0, keepdims=False),
        )
        for p in pref[n:]
    )
    return h_in


def _local_real(a_blk, b_blk, *, axis, axis_name):
    A, H = lax.associative_scan(_combine_real, (a_blk, b_blk), axis=axis)
    (h_in,) = _carry_in((A,), (H,), _combine_real, axis, axis_name)
    return H + A * jnp.expand_dims(h_in, axis)


def _local_pair(ar, ai, br, bi, *, axis, axis_name):
    Ar, Ai, Hr, Hi = lax.associative_scan(_combine_pair, (ar, ai, br, bi), axis=axis)
    hr, hi = _carry_in((Ar, Ai), (Hr, Hi), _combine_pair, axis, axis_name)
    hr, hi = jnp.expand_dims(hr, axis), jnp.expand_dims(hi, axis)
    return Hr + Ar * hr - Ai * hi, Hi + Ar * hi + Ai * hr


def sp_diag_linear_scan(
    a: ArrayOrPair,
    b: ArrayOrPair,
    mesh: Mesh,
    *,
    axis: int = -2,
    axis_name: str = "seq",
    reverse: bool = False,
) -> ArrayOrPair:
    """``diag_linear_scan`` with the time axis sharded over ``mesh``'s
    ``axis_name`` axis.  Accepts/returns the same array-or-(re, im)-pair
    types as the single-device op; the time length must divide the axis
    size.  Call under ``jax.jit`` for a single fused SPMD program.

    ``reverse=True`` (bidirectional S5, ref models/s5.py:84-88) flips the
    inputs/outputs around the forward mesh scan — the inclusive
    right-to-left scan identity."""
    if reverse:
        flip = lambda t: (
            (jnp.flip(t[0], axis), jnp.flip(t[1], axis))
            if _is_pair(t) else jnp.flip(t, axis)
        )
        out = sp_diag_linear_scan(
            flip(a), flip(b), mesh, axis=axis, axis_name=axis_name
        )
        return flip(out)
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    want_complex_array = False
    if _is_pair(a) or _is_pair(b):
        a, b = cplx.pair(a), cplx.pair(b)
        complex_mode = True
    elif jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        a, b = cplx.pair(a), cplx.pair(b)
        complex_mode = True
        want_complex_array = True
    else:
        complex_mode = False

    if complex_mode:
        parts = jnp.broadcast_arrays(a[0], a[1], b[0], b[1])
        ndim = parts[0].ndim
    else:
        parts = jnp.broadcast_arrays(a, b.astype(jnp.result_type(a, b)))
        ndim = parts[0].ndim
    if axis < 0:
        axis += ndim
    L = parts[0].shape[axis]
    n = mesh.shape[axis_name]
    if L % n != 0:
        raise ValueError(f"time length {L} not divisible by {axis_name} axis {n}")

    spec = P(*([None] * axis), axis_name)
    local = _local_pair if complex_mode else _local_real
    fn = shard_map(
        partial(local, axis=axis, axis_name=axis_name),
        mesh=mesh,
        in_specs=tuple(spec for _ in parts),
        out_specs=(spec, spec) if complex_mode else spec,
    )
    out = fn(*parts)
    if want_complex_array:
        return cplx.to_complex(out)
    return out


def _linear_attention_block(
    q_blk, k_blk, v_blk, *, scale, axis_name, return_normalizer=False, eps=None
):
    from ..ops import scan as scan_mod
    from ..ops.linear_attention import chunked_linear_attention

    n = lax.psum(1, axis_name)
    idx = lax.axis_index(axis_name)
    f32 = jnp.promote_types(k_blk.dtype, jnp.float32)
    # mask the sequence_parallel context while tracing the LOCAL kernel —
    # chunked_linear_attention routes back here when it sees it active
    prev, scan_mod._SP_STATE = scan_mod._SP_STATE, None
    try:
        if return_normalizer:
            y_local, n_local = chunked_linear_attention(
                q_blk, k_blk, v_blk, scale=scale, return_normalizer=True
            )
        else:
            y_local = chunked_linear_attention(q_blk, k_blk, v_blk, scale=scale)
    finally:
        scan_mod._SP_STATE = prev
    # per-shard KV summary; f32 accumulation for the cross-shard state
    S = jnp.einsum(
        "blhd,blhe->bhde", (k_blk * scale).astype(jnp.float32),
        v_blk.astype(jnp.float32),
    )
    Ss = lax.all_gather(S, axis_name)  # (n, B, H, Dk, Dv)
    before = (jnp.arange(n) < idx).astype(Ss.dtype)
    S_in = jnp.einsum("n...,n->...", Ss, before).astype(q_blk.dtype)
    y = y_local + jnp.einsum("blhd,bhde->blhe", q_blk, S_in)
    if not return_normalizer:
        return y
    # normalizer carry: n_t += q_t · Σ_{earlier shards} k  (scaled, f32 —
    # matching the fused normalizer's precision contract)
    ksum = (k_blk.astype(f32) * scale).sum(axis=1)  # (B, H, Dk)
    Ks = lax.all_gather(ksum, axis_name)  # (n, B, H, Dk)
    k_in = jnp.einsum("n...,n->...", Ks, before.astype(f32))
    n_out = n_local + jnp.einsum("blhd,bhd->blh", q_blk.astype(f32), k_in)
    if eps is not None:
        n_out = jnp.where(n_out == 0, jnp.full((), eps, n_out.dtype), n_out)
    return y, n_out


def sp_linear_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    scale: float = 1.0,
    axis_name: str = "seq",
    return_normalizer: bool = False,
    eps: Optional[float] = None,
):
    """Causal linear attention (the GLA g=None state recurrence,
    ops/linear_attention.py) with the (B, L, H, D) time axis sharded over
    ``mesh``: each device runs the chunked kernel on its shard, per-shard
    KV-state summaries Σ k_t v_tᵀ travel once over ICI (one all-gather of
    (B, H, Dk, Dv) per device), and queries pick up the carried-in state.
    Exact vs the single-device kernel up to float reassociation.

    ``return_normalizer=True`` additionally returns the cross-shard fused
    normalizer n_t = q_t · Σ_{s≤t} k_s (f32), extending the per-shard k-sum
    with one extra (B, H, Dk) all-gather."""
    try:
        from jax import shard_map
    except ImportError:  # pre-0.8 JAX
        from jax.experimental.shard_map import shard_map

    L, n = q.shape[1], mesh.shape[axis_name]
    if L % n != 0:
        raise ValueError(f"sequence length {L} not divisible by {axis_name} axis {n}")
    spec = P(None, axis_name)
    fn = shard_map(
        partial(
            _linear_attention_block, scale=float(scale), axis_name=axis_name,
            return_normalizer=return_normalizer, eps=eps,
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(spec, spec) if return_normalizer else spec,
    )
    return fn(q, k, v)
