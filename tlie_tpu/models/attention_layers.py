"""Multi-head attention mixers: softmax (MHA), linear, and norm attention.

Flax counterparts of the reference's torch attention stack
(ref models/attention.py, models/norm_attention.py), with the compute routed
through the TPU ops:

  * softmax attention → Pallas flash kernel (K2; replaces flash-attn CUDA)
  * linear attention  → chunked cumulative-KV matmuls (K3; replaces the
    cumsum formulation and fla's Triton kernels)
  * norm attention    → same chunked kernel + the learned decay normaliser
    n_t = exp(−norm_fn(n_proj (+ offset))) (the paper's novel layer,
    ref models/norm_attention.py:27-157)

Projections keep the reference's fused layouts (``Wqkv``: 2·d_qk + d_model,
``Wvqkn``: d_model + 2·d_qk + num_heads) so eigen-analysis can recompute
scores from the same parameter blocks.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.attention import causal_softmax_attention
from ..ops.linear_attention import chunked_linear_attention
from .layers import DepthwiseCausalConv, torch_linear_init


def _split_heads(x, num_heads):
    b, l, d = x.shape
    return x.reshape(b, l, num_heads, d // num_heads)


def _merge_heads(x):
    b, l, h, d = x.shape
    return x.reshape(b, l, h * d)


def norm_fn_by_name(name: str):
    if name == "exp":
        return jnp.exp
    if name == "elu":
        return jax.nn.elu
    if name == "softplus":
        return jax.nn.softplus
    if name == "sigmoid":
        return jax.nn.sigmoid
    raise RuntimeError(f"normalization function {name} not implemented!")


def approx_fn_by_name(name: str):
    if name == "none":
        return lambda x: x
    if name == "elu":
        return lambda x: jax.nn.elu(x) + 1
    raise RuntimeError(f"approximation function {name} not implemented!")


def init_offset(size: int, a=0.02, b=0.1, lo=8.0, hi=14.0) -> np.ndarray:
    """Uniform-spread offset init (ref models/norm_attention.py:17-24)."""
    if size == 1:
        return np.array([(hi - lo) / 2], dtype=np.float32)
    x = np.log(np.expm1(np.linspace(a, b, size)))
    x = (x - x.min()) / (x.max() - x.min())
    return (x * abs(hi - lo) + lo).astype(np.float32)


class MHA(nn.Module):
    """Multi-head self-attention, softmax or linear
    (ref models/attention.py:85-182)."""

    d_model: int
    d_qk: Optional[int] = None
    num_heads: int = 1
    dim_conv: int = 0
    lin_att: bool = True
    dropout: float = 0.0
    bias: bool = True
    use_flash: bool = True
    conv_type: str = "full"
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        d_qk = self.d_qk if self.d_qk is not None else self.d_model
        head_dim = d_qk // self.num_heads
        v_dim = self.d_model // self.num_heads
        L = x.shape[-2]

        qkv = nn.Dense(
            2 * d_qk + self.d_model, use_bias=self.bias, name="Wqkv",
            dtype=self.dtype, **torch_linear_init(self.d_model),
        )(x)

        if self.dim_conv > 0:
            if self.conv_type == "full":
                conv = DepthwiseCausalConv(
                    self.d_model + 2 * d_qk, self.dim_conv, name="conv1d",
                    dtype=self.dtype,
                )
                qkv = jax.nn.silu(conv(qkv))
            else:
                qk, v = qkv[..., : 2 * d_qk], qkv[..., 2 * d_qk :]
                conv = DepthwiseCausalConv(
                    2 * d_qk, self.dim_conv, name="conv1d", dtype=self.dtype
                )
                qk = jax.nn.silu(conv(qk))
                qkv = jnp.concatenate([qk, v], axis=-1)

        q = _split_heads(qkv[..., :d_qk], self.num_heads)
        k = _split_heads(qkv[..., d_qk : 2 * d_qk], self.num_heads)
        v = _split_heads(qkv[..., 2 * d_qk :], self.num_heads)

        if self.lin_att:
            q = jax.nn.elu(q) + 1
            k = jax.nn.elu(k) + 1
            # fused normalizer: n_t = q_t·Σk is the row-sum/prefix marginal
            # of the chunked quantities the output needs anyway — one pass
            num, n = chunked_linear_attention(
                q, k, v, scale=1.0, return_normalizer=True
            )
            context = num / n[..., None]
            context = nn.Dropout(self.dropout, deterministic=self.deterministic)(
                context
            )
        else:
            impl = None
            if not self.use_flash or head_dim != v_dim:
                impl = "xla"
            # softmax row-max/exp run f32 regardless of compute dtype; the
            # bf16 win here is the projections and the qkv tensors above
            f32 = jnp.promote_types(q.dtype, jnp.float32)
            context = causal_softmax_attention(
                q.astype(f32), k.astype(f32), v.astype(f32),
                scale=1.0 / math.sqrt(head_dim), impl=impl,
            )
            context = nn.Dropout(self.dropout, deterministic=self.deterministic)(
                context
            )

        return nn.Dense(
            self.d_model, name="out_proj", dtype=self.dtype,
            **torch_linear_init(self.d_model),
        )(_merge_heads(context))


class MHNA(nn.Module):
    """Multi-head norm attention — linear attention with a learned
    normaliser decay (ref models/norm_attention.py:160-258)."""

    d_model: int
    d_qk: Optional[int] = None
    num_heads: int = 1
    norm_fn: str = "exp"
    approx_fn: str = "none"
    scale_B: bool = False
    offset: bool = False
    offset_init: str = "uniform"
    dim_conv: int = 0
    dropout: float = 0.0
    bias: bool = True
    conv_type: str = "full"
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        d_qk = self.d_qk if self.d_qk is not None else self.d_model
        head_dim = d_qk // self.num_heads

        vqkn = nn.Dense(
            self.d_model + 2 * d_qk + self.num_heads, use_bias=self.bias,
            name="Wvqkn", dtype=self.dtype, **torch_linear_init(self.d_model),
        )(x)
        vqk = vqkn[..., : self.d_model + 2 * d_qk]
        # the learned normaliser decay is ≥f32 throughout (it exponentiates)
        n = vqkn[..., self.d_model + 2 * d_qk :]  # (B, L, H)
        n = n.astype(jnp.promote_types(n.dtype, jnp.float32))

        if self.dim_conv > 0:
            if self.conv_type == "full":
                conv = DepthwiseCausalConv(
                    self.d_model + 2 * d_qk, self.dim_conv, name="conv1d",
                    dtype=self.dtype,
                )
                vqk = jax.nn.silu(conv(vqk))
            else:
                v_part, qk = vqk[..., : self.d_model], vqk[..., self.d_model :]
                conv = DepthwiseCausalConv(
                    2 * d_qk, self.dim_conv, name="conv1d", dtype=self.dtype
                )
                qk = jax.nn.silu(conv(qk))
                vqk = jnp.concatenate([v_part, qk], axis=-1)

        v = _split_heads(vqk[..., : self.d_model], self.num_heads)
        q = _split_heads(vqk[..., self.d_model : self.d_model + d_qk], self.num_heads)
        k = _split_heads(vqk[..., self.d_model + d_qk :], self.num_heads)

        fn = approx_fn_by_name(self.approx_fn)
        q, k = fn(q), fn(k)
        scale = 1.0 / math.sqrt(head_dim) if self.scale_B else 1.0

        output = chunked_linear_attention(q, k, v, scale=scale)

        nf = norm_fn_by_name(self.norm_fn)
        if self.offset:
            off_init = init_offset if self.offset_init == "uniform" else (
                lambda size: np.linspace(4.0, 9.0, size, dtype=np.float32)
            )
            if self.offset_init not in ("uniform", "exp"):
                raise RuntimeError(f"Invalid init option {self.offset_init}")
            offset = self.param(
                "offset",
                lambda rng, shape: jnp.asarray(off_init(shape[0])),
                (self.num_heads,),
            )
            n = jnp.exp(-nf(n + offset))
        else:
            n = jnp.exp(-nf(n))

        output = n.astype(output.dtype)[..., None] * output
        output = nn.Dropout(self.dropout, deterministic=self.deterministic)(output)
        return nn.Dense(
            self.d_model, name="out_proj", dtype=self.dtype,
            **torch_linear_init(self.d_model),
        )(_merge_heads(output))
