"""Shared blocks for the attention / Mamba model families.

Flax counterparts of the reference's torch building blocks
(ref models/common.py:15-176): MLP, GLU, the learned convex-combination
LAMBDA mixer, the LRA classifier head, GPT-2-style token+position
embeddings, and the LRA-retrieval MATCH head.  All natively batched
(..., L, d).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def torch_linear_init(fan_in: int) -> dict:
    """torch ``nn.Linear`` default init: kaiming_uniform(a=√5) weight
    ⇒ U(±1/√fan_in), bias U(±1/√fan_in).

    The reference's transformer/Mamba families are torch modules relying on
    these defaults; flax's lecun-normal + zero-bias defaults sample a
    different distribution (≈1.7× wider weights, no bias noise), which
    changes training dynamics even though shapes/names match.  All
    torch-family Denses take these initializers; the JAX-side families
    (LRU/S4/S5 backbone) keep flax defaults, as the reference does."""
    k = 1.0 / math.sqrt(fan_in)

    def _uniform(rng, shape, dtype=jnp.float32):
        return jax.random.uniform(rng, shape, dtype, -k, k)

    return {"kernel_init": _uniform, "bias_init": _uniform}


# torch ``nn.Embedding`` default init: N(0, 1) — flax's default is
# N(0, 1/√features), an ~11× scale difference at d_model 128 that dominates
# the residual stream at init
torch_embed_init = nn.initializers.normal(stddev=1.0)


class MLP(nn.Module):
    """Dense→GELU→dropout→Dense (ref models/common.py:33-48)."""

    mlp_dim: int
    output_dim: Optional[int] = None
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out_dim = self.output_dim if self.output_dim is not None else x.shape[-1]
        x = nn.Dense(self.mlp_dim, name="encoder", dtype=self.dtype,
                     **torch_linear_init(x.shape[-1]))(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU() is erf-exact
        x = nn.Dropout(self.dropout, deterministic=self.deterministic)(x)
        x = nn.Dense(out_dim, name="decoder", dtype=self.dtype,
                     **torch_linear_init(self.mlp_dim))(x)
        return nn.Dropout(self.dropout, deterministic=self.deterministic)(x)


class GLU(nn.Module):
    """x ↦ a · σ(b) from a single width-2d projection (ref models/common.py:50-58)."""

    dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        out = nn.Dense(2 * d, name="linear", dtype=self.dtype,
                       **torch_linear_init(d))(x)
        out = out[..., :d] * jax.nn.sigmoid(out[..., d:])
        return nn.Dropout(self.dropout, deterministic=self.deterministic)(out)


class LAMBDA(nn.Module):
    """Learned convex combination of a GLU branch and an MLP branch sharing
    one encoder (ref models/common.py:60-84); α is logit-parameterised."""

    init: float = 0.5
    dropout: float = 0.0
    deterministic: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        xz = nn.Dense(2 * d, name="encoder", dtype=self.dtype,
                      **torch_linear_init(d))(x)
        alpha_init = -math.log(1.0 / self.init - 1.0)
        alpha = self.param("alpha", lambda rng, shape: jnp.full(shape, alpha_init), (1,))
        a = jax.nn.sigmoid(alpha)

        glu_out = xz[..., :d] * jax.nn.sigmoid(xz[..., d:])
        mlp_h = nn.Dropout(self.dropout, deterministic=self.deterministic)(
            nn.gelu(xz, approximate=False)  # torch nn.GELU() is erf-exact
        )
        mlp_out = nn.Dense(d, name="decoder", dtype=self.dtype,
                           **torch_linear_init(2 * d))(mlp_h)

        out = a * glu_out + (1 - a) * mlp_out
        return nn.Dropout(self.dropout, deterministic=self.deterministic)(out)


class ClassifierHead(nn.Module):
    """Pooling + optional 2-layer ReLU MLP (ref models/common.py:88-115)."""

    mlp_dim: int
    num_classes: int
    pooling: str

    @nn.compact
    def __call__(self, x):
        if self.pooling == "mean":
            x = jnp.mean(x, axis=-2)
        elif self.pooling == "max":
            x = jnp.max(x, axis=-2)
        elif self.pooling == "sum":
            x = jnp.sum(x, axis=-2)
        elif self.pooling == "cls":
            x = x[..., 0, :]
        # anything else: no pooling
        if self.mlp_dim != 0:
            x = nn.Dense(self.mlp_dim, name="encoder",
                         **torch_linear_init(x.shape[-1]))(x)
            x = nn.relu(x)
            x = nn.Dense(self.num_classes, name="decoder",
                         **torch_linear_init(self.mlp_dim))(x)
        return x


class TokenEmbeddings(nn.Module):
    """GPT-2-style learnable token (+ optional position) embeddings
    (ref models/common.py:117-176)."""

    embed_dim: int
    vocab_size: int
    max_position_embeddings: int = 0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, input_ids, position_ids=None):
        emb = nn.Embed(
            self.vocab_size, self.embed_dim, name="word_embeddings",
            dtype=self.dtype, embedding_init=torch_embed_init,
        )(input_ids)
        if self.max_position_embeddings > 0:
            if position_ids is None:
                position_ids = jnp.arange(input_ids.shape[-1])
            emb = emb + nn.Embed(
                self.max_position_embeddings,
                self.embed_dim,
                name="position_embeddings",
                dtype=self.dtype,
                embedding_init=torch_embed_init,
            )(position_ids)
        return emb


class MATCH(nn.Module):
    """LRA-retrieval matching head: 3-layer ReLU MLP over the concatenated
    pair encodings (ref models/common.py:15-29)."""

    mlp_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.mlp_dim, name="encoder",
                             **torch_linear_init(x.shape[-1]))(x))
        x = nn.relu(nn.Dense(self.mlp_dim // 2, name="middle",
                             **torch_linear_init(self.mlp_dim))(x))
        return nn.Dense(self.output_dim, name="decoder",
                        **torch_linear_init(self.mlp_dim // 2))(x)


class DepthwiseCausalConv(nn.Module):
    """Depthwise causal conv parameters around ops.conv (torch Conv1d
    groups=C parity; ref models/attention.py:140-147)."""

    dim: int
    kernel_size: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        from ..ops.conv import depthwise_causal_conv1d

        # torch Conv1d default init: uniform(-k, k), k = 1/sqrt(in/groups * K)
        k = 1.0 / math.sqrt(self.kernel_size)
        weight = self.param(
            "weight",
            lambda rng, shape: jax.random.uniform(rng, shape, minval=-k, maxval=k),
            (self.kernel_size, self.dim),
        )
        bias = self.param(
            "bias",
            lambda rng, shape: jax.random.uniform(rng, shape, minval=-k, maxval=k),
            (self.dim,),
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            weight = weight.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return depthwise_causal_conv1d(x, weight, bias)
