"""Causal softmax attention: Pallas flash kernel + XLA reference path.

Replaces the reference's ``flash_attn_qkvpacked_func`` CUDA kernel
(ref models/attention.py:37-55) and its naive fallback
(ref models/attention.py:12-35).  On TPU the flash path uses the Pallas
flash-attention kernel shipped with JAX (block-tiled online softmax in VMEM);
the XLA path is the ground-truth oracle and the fallback for shapes the
kernel cannot tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def _xla_causal_attention(q, k, v, scale):
    # q, k: (B, L, H, Dk); v: (B, L, H, Dv)
    L = q.shape[1]
    scores = jnp.einsum("bthd,bshd->bhts", q, k * scale)
    causal = jnp.tril(jnp.ones((L, L), dtype=bool))
    scores = jnp.where(causal[None, None], scores, jnp.full((), -1e30, scores.dtype))
    f32 = jnp.promote_types(scores.dtype, jnp.float32)
    probs = jax.nn.softmax(scores.astype(f32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshd->bthd", probs, v)


@functools.lru_cache(maxsize=1)
def _flash_module():
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    return fa


def _flash_eligible(q, k, v) -> bool:
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    B, L, H, Dk = q.shape
    if v.shape[-1] != Dk:
        return False
    if Dk % 128 != 0:
        return False
    return L % 128 == 0 and L >= 128


def _pallas_flash_attention(q, k, v, scale):
    fa = _flash_module()
    # pallas kernel layout is (B, H, L, D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    L = qt.shape[2]
    blk = min(512, L)
    block_sizes = fa.BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = fa.flash_attention(
        qt, kt, vt, causal=True, sm_scale=float(scale), block_sizes=block_sizes
    )
    return jnp.swapaxes(out, 1, 2)


def causal_softmax_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jax.Array:
    """Multi-head causal softmax attention.

    Args:
      q, k: (B, L, H, Dk); v: (B, L, H, Dv).
      scale: softmax scale; defaults to 1/sqrt(Dk) (ref models/attention.py:26).
      impl: "flash" | "xla" | None (auto).

    Returns: (B, L, H, Dv).

    Under an active ``ops.scan.sequence_parallel`` context the computation
    routes to ring attention over the seq mesh (parallel/ring.py).
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    from .scan import _SP_STATE

    if _SP_STATE is not None:
        from ..parallel.ring import ring_causal_attention

        mesh, axis_name = _SP_STATE
        return ring_causal_attention(
            q, k, v, mesh, scale=scale, axis_name=axis_name
        )
    if impl is None:
        impl = "flash" if _flash_eligible(q, k, v) else "xla"
    if impl == "flash":
        return _pallas_flash_attention(q, k, v, scale)
    if impl == "xla":
        return _xla_causal_attention(q, k, v, scale)
    raise ValueError(f"Unknown attention impl {impl!r}")
