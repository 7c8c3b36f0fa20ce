"""Unified sequence backbone for the SSM model families (LRU / S5 / S4).

Functional counterpart of the reference's JAX stack
(ref models/jax_layers.py): Dense encoder → N × (norm → SSM → GLU-variant
activation → dropout → residual) → pooling → Dense decoder → log-softmax.

Key difference from the reference: modules are **natively batched** over
(B, L, ·) instead of per-example modules lifted with ``nn.vmap`` — the
compiled HLO is the same batched matmuls, but the code states it directly
and BatchNorm/dropout axes are explicit.  The flax parameter tree
(``encoder/encoder``, ``encoder/layers_i/{seq,out1,out2,normalize}``,
``decoder``) is kept identical to the reference so its orbax checkpoints
restore into this backbone unchanged (analysis relies on that layout,
ref analysis/eval_eig.py:241-252).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn


class DenseEmbed(nn.Module):
    """Dense layer with an embedding-gather fast path for integer tokens.

    Mathematically identical to ``Dense(one_hot(x))`` — the reference's
    encoder path for token tasks (ref jax_helpers/train_helpers.py:310-311 +
    models/jax_layers.py:113) — but gathers rows of the kernel instead of
    materialising a (B, L, vocab) one-hot cube on the TPU.  Parameter names
    and shapes match ``nn.Dense`` so reference checkpoints restore.
    """

    features: int
    in_features: int | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        is_tokens = jnp.issubdtype(x.dtype, jnp.integer)
        in_features = self.in_features if is_tokens else x.shape[-1]
        if in_features is None:
            raise ValueError("DenseEmbed needs in_features for integer inputs")
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if self.dtype is not None:
            kernel, bias = kernel.astype(self.dtype), bias.astype(self.dtype)
            if not is_tokens:
                x = x.astype(self.dtype)
        if is_tokens:
            return jnp.take(kernel, x, axis=0) + bias
        return x @ kernel + bias


class SequenceLayer(nn.Module):
    """Single residual block around an SSM core (ref models/jax_layers.py:10-84).

    Activation variants: full_glu / half_glu1 / half_glu2 / gelu.
    """

    ssm: Callable[..., nn.Module]
    d_model: int
    dropout: float = 0.0
    activation: str = "full_glu"
    training: bool = True
    prenorm: bool = True
    norm: str = "layer"
    dtype: jnp.dtype | None = None

    def setup(self):
        self.seq = self.ssm()
        if self.activation == "full_glu":
            self.out1 = nn.Dense(self.d_model, dtype=self.dtype)
            self.out2 = nn.Dense(self.d_model, dtype=self.dtype)
        elif self.activation in ("half_glu1", "half_glu2"):
            self.out2 = nn.Dense(self.d_model, dtype=self.dtype)
        if self.norm == "batch":
            # stats over (batch, time); feature axis last
            self.normalize = nn.BatchNorm(
                use_running_average=not self.training, axis_name=None
            )
        else:
            self.normalize = nn.LayerNorm()
        # one mask per (example, feature), broadcast across time (axis -2)
        self.drop = nn.Dropout(
            self.dropout, broadcast_dims=[-2], deterministic=not self.training
        )

    def __call__(self, x):
        skip = x
        if self.prenorm:
            x = self.normalize(x)
        # the SSM core always computes f32: its recurrence compounds rounding
        # (bf16 inputs reach here only on post-norm stacks, where the encoder
        # output flows in directly)
        x = self.seq(x.astype(jnp.float32) if x.dtype == jnp.bfloat16 else x)
        if self.activation == "full_glu":
            x = self.drop(nn.gelu(x))
            x = self.out1(x) * jax.nn.sigmoid(self.out2(x))
            x = self.drop(x)
        elif self.activation == "half_glu1":
            x = self.drop(nn.gelu(x))
            x = x * jax.nn.sigmoid(self.out2(x))
            x = self.drop(x)
        elif self.activation == "half_glu2":
            x1 = self.drop(nn.gelu(x))
            x = x * jax.nn.sigmoid(self.out2(x1))
            x = self.drop(x)
        elif self.activation == "gelu":
            x = self.drop(nn.gelu(x))
        else:
            raise NotImplementedError(f"Activation: {self.activation} not implemented")
        x = skip + x
        if not self.prenorm:
            x = self.normalize(x)
        return x


class StackedEncoderModel(nn.Module):
    """Dense encoder + stack of SequenceLayers (ref models/jax_layers.py:87-139)."""

    ssm: Callable[..., nn.Module]
    d_model: int
    n_layers: int
    activation: str = "full_glu"
    dropout: float = 0.0
    training: bool = True
    prenorm: bool = True
    norm: str = "layer"
    d_input: int | None = None  # needed only for integer-token inputs
    dtype: jnp.dtype | None = None

    def setup(self):
        self.encoder = DenseEmbed(
            self.d_model, in_features=self.d_input, dtype=self.dtype
        )
        self.layers = [
            SequenceLayer(
                ssm=self.ssm,
                dropout=self.dropout,
                d_model=self.d_model,
                activation=self.activation,
                training=self.training,
                prenorm=self.prenorm,
                norm=self.norm,
                dtype=self.dtype,
            )
            for _ in range(self.n_layers)
        ]

    def __call__(self, x):
        x = self.encoder(x)
        for layer in self.layers:
            x = layer(x)
        return x


def masked_meanpool(x, lengths):
    """Mean over the valid (pre-padding) prefix of the time axis.

    x: (B, L, d); lengths: (B,) → (B, d).  (ref models/jax_layers.py:142-155)
    """
    L = x.shape[-2]
    mask = jnp.arange(L)[None, :] < lengths[:, None]
    return jnp.sum(mask[..., None] * x, axis=-2) / lengths[:, None]


class ClassificationModel(nn.Module):
    """Backbone + pooling + Dense decoder + log-softmax
    (ref models/jax_layers.py:162-240).  Natively batched: input (B, L, d_in)
    or, when ``padded``, a tuple (inputs, lengths)."""

    ssm: Callable[..., nn.Module]
    d_output: int
    d_model: int
    n_layers: int
    padded: bool = False
    activation: str = "full_glu"
    dropout: float = 0.2
    training: bool = True
    pooling: str = "mean"
    prenorm: bool = True
    norm: str = "layer"
    d_input: int | None = None  # needed only for integer-token inputs
    # The reference emits log-probs (ref models/jax_layers.py:240).  The
    # masked-CE loss is exactly invariant to the extra log_softmax
    # (log_softmax∘log_softmax = log_softmax) but its backward costs ~100 ms
    # at (64, 512, 8192) — the trainer sets logits_output=True.
    logits_output: bool = False
    # opt-in bf16 mixed precision (model.compute_dtype): the encoder/decoder
    # and GLU Dense matmuls ride this dtype; the SSM core, norms, residual
    # adds and the loss reduction stay f32 (params are stored f32 always)
    dtype: jnp.dtype | None = None

    def setup(self):
        self.encoder = StackedEncoderModel(
            ssm=self.ssm,
            d_model=self.d_model,
            n_layers=self.n_layers,
            activation=self.activation,
            dropout=self.dropout,
            training=self.training,
            prenorm=self.prenorm,
            norm=self.norm,
            d_input=self.d_input,
            dtype=self.dtype,
        )
        self.decoder = nn.Dense(self.d_output, dtype=self.dtype)

    def features(self, x):
        """Backbone features before pooling/decoder — consumed by the
        sparse/fused decoder-head paths (training/scan_loop.py)."""
        if self.padded:
            x, _ = x
        return self.encoder(x)

    def __call__(self, x):
        if self.padded:
            x, lengths = x
        x = self.encoder(x)
        if self.pooling == "mean":
            if self.padded:
                x = masked_meanpool(x, lengths)
            else:
                x = jnp.mean(x, axis=-2)
        elif self.pooling == "last":
            if self.padded:
                raise NotImplementedError(
                    "pooling='last' with padded sequences is not supported"
                )
            x = x[..., -1, :]
        elif self.pooling == "none":
            pass
        else:
            raise NotImplementedError("pooling must be in ['mean', 'last', 'none']")
        x = self.decoder(x)
        if self.logits_output:
            return x
        return nn.log_softmax(x, axis=-1)


# API-compat alias: the reference exposes a vmapped wrapper under this name
# (ref models/jax_layers.py:244-251); here the model is natively batched.
BatchClassificationModel = ClassificationModel
