"""Depthwise causal 1-D convolution (the Mamba / attention "conv branch").

Fills the role of the reference's cuDNN ``nn.Conv1d(groups=C, padding=K-1)``
sliced back to length L (ref models/mamba.py:98-105,130-133;
models/attention.py:140-147; models/norm_attention.py:221-228) and of the
``causal_conv1d`` CUDA library.

On TPU a short depthwise conv is purely bandwidth-bound.  XLA's native
grouped convolution (``lax.conv_general_dilated`` with
``feature_group_count=C``) is the default lowering: the round-4 on-chip A/B
at the WikiText block shape (B8, L1024, C1536, K4, bf16, fwd+bwd) measured
it ~3× cheaper per application than the unrolled shift-multiply-add this op
previously used (0.12 vs 0.40 ms real, tools/profile_conv_lowering.py) —
the unrolled form materialises K−1 shifted copies through its backward.
``TLIE_CONV=unrolled`` restores the old lowering for A/B.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

_UNROLL_MAX = 8


def depthwise_causal_conv1d(
    x: jax.Array,
    weight: jax.Array,
    bias: Optional[jax.Array] = None,
) -> jax.Array:
    """Causal depthwise conv.

    Args:
      x: (..., L, C) input sequence.
      weight: (K, C) per-channel filter taps, tap K-1 multiplying the current
        timestep (torch Conv1d weight layout transposed: torch's
        ``weight[c, 0, k]`` equals ``weight[k, c]`` here).
      bias: optional (C,).

    Returns:
      (..., L, C) with y[t] = sum_k weight[k] * x[t - (K-1) + k] (+ bias).
    """
    K = weight.shape[0]
    if K <= _UNROLL_MAX and os.environ.get("TLIE_CONV") == "unrolled":
        y = x * weight[K - 1]
        for k in range(K - 1):
            shift = K - 1 - k
            shifted = jnp.pad(
                x[..., :-shift, :],
                [(0, 0)] * (x.ndim - 2) + [(shift, 0), (0, 0)],
            )
            y = y + shifted * weight[k]
    else:
        lead = x.shape[:-2]
        L, C = x.shape[-2:]
        xr = x.reshape((-1, L, C))
        kernel = weight[:, None, :]  # (K, 1, C) in 'LIO' depthwise layout
        y = lax.conv_general_dilated(
            xr,
            kernel.astype(x.dtype),
            window_strides=(1,),
            padding=[(K - 1, 0)],
            dimension_numbers=("NLC", "LIO", "NLC"),
            feature_group_count=C,
        )
        y = y.reshape(lead + (L, C))
    if bias is not None:
        y = y + bias
    return y
