"""Transformer model family (softmax / linear / norm attention).

Flax counterpart of the reference's torch Transformer
(ref models/transformer.py): pre-norm residual attention block with optional
SiLU gate branch, a mixer stage (MLP / GLU / hybrid-LAMBDA / none), token or
dense encoder, final norm, classifier head or tied-free decoder, optional
retrieval MATCH head.  Config keys are the reference's model-config schema
so reference YAMLs drive this class unchanged.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention_layers import MHA, MHNA
from .layers import (GLU, LAMBDA, MATCH, MLP, ClassifierHead,
                     TokenEmbeddings, torch_linear_init)


class TransformerBlock(nn.Module):
    """One block (ref models/transformer.py:22-111)."""

    hidden_dim: int
    cfg: Dict[str, Any]
    deterministic: bool = True

    def setup(self):
        cfg = self.cfg
        d_model = self.hidden_dim
        d_qk = cfg["state_dim"]
        num_heads = cfg["num_heads"]
        att_dropout = cfg.get("att_dropout", 0.0)
        conv_type = cfg.get("conv_type", "full")
        use_flash = cfg.get("use_flash", False)
        attention_fn = cfg["attention_fn"]
        dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else None

        if attention_fn in ("sm-attention", "lin-attention"):
            self.attention = MHA(
                d_model=d_model,
                d_qk=d_qk,
                num_heads=num_heads,
                dim_conv=cfg.get("dim_conv", 0),
                lin_att=attention_fn == "lin-attention",
                dropout=att_dropout,
                use_flash=use_flash,
                conv_type=conv_type,
                deterministic=self.deterministic,
                dtype=dtype,
            )
        elif attention_fn == "norm-attention":
            self.attention = MHNA(
                d_model=d_model,
                d_qk=d_qk,
                num_heads=num_heads,
                norm_fn=cfg["norm_fn"],
                approx_fn=cfg["approx_fn"],
                scale_B=cfg["scale_B"],
                offset=cfg["offset"],
                offset_init=cfg["offset_init"],
                dim_conv=cfg["dim_conv"],
                dropout=att_dropout,
                conv_type=conv_type,
                deterministic=self.deterministic,
                dtype=dtype,
            )
        else:
            raise RuntimeError(f"attention_fn {attention_fn} not implemented")

        self.use_gate = cfg.get("use_gate", False)
        if self.use_gate:
            # ref transformer.py:63-65: xavier_uniform_(gain=0.1), bias 1.0;
            # torch's gain g == jax variance_scaling(g², fan_avg, uniform)
            self.Wz = nn.Dense(
                d_model,
                kernel_init=nn.initializers.variance_scaling(
                    0.01, "fan_avg", "uniform"
                ),
                bias_init=nn.initializers.constant(1.0),
                dtype=dtype,
            )

        mixer = cfg["mixer"]
        dropout = cfg["dropout"]
        if mixer == "mlp":
            self.mixer = MLP(
                cfg["mixer_dim"], dropout=dropout,
                deterministic=self.deterministic, dtype=dtype,
            )
            self.drop_skip = False
        elif mixer == "glu":
            self.mixer = GLU(deterministic=self.deterministic, dtype=dtype)
            self.drop_skip = False
        elif mixer == "hybrid":
            self.mixer = LAMBDA(
                init=0.2, dropout=dropout,
                deterministic=self.deterministic, dtype=dtype,
            )
            self.drop_skip = False
        elif mixer == "none":
            self.mixer = None
            self.drop_skip = True
        else:
            raise RuntimeError(f"{mixer} mixer not implemented yet!")

        if cfg["norm"] != "layer":
            raise RuntimeError(f"{cfg['norm']} norm not implemented yet!")
        self.norm = nn.LayerNorm(epsilon=1e-5)  # torch nn.LayerNorm eps parity
        self.drop = nn.Dropout(dropout, deterministic=self.deterministic)

    def __call__(self, x):
        if self.use_gate:
            z = self.Wz(x)
        skip = x
        x = self.norm(x)
        x = self.attention(x)
        x = self.drop(x)
        x = x + skip

        y = self.norm(x)
        y = self.mixer(y) if self.mixer is not None else y

        if self.drop_skip:
            if self.use_gate:
                y = y * jax.nn.silu(z)
        else:
            if self.use_gate:
                y = (x + y) * jax.nn.silu(z)
            else:
                y = x + y
        return y


class Transformer(nn.Module):
    """Full model (ref models/transformer.py:113-161); cfg is the reference
    model-config dict."""

    cfg: Dict[str, Any]
    deterministic: bool = True

    def setup(self):
        cfg = self.cfg
        hidden_dim = cfg["hidden_dim"]
        self.dual = cfg.get("dual", False)
        self.classify = cfg.get("classifier", False)
        dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else None

        if cfg.get("embedding", False):
            self.encoder = TokenEmbeddings(
                hidden_dim, cfg["vocab_size"], cfg.get("max_pos_embed", 0),
                dtype=dtype,
            )
        else:
            self.encoder = nn.Dense(
                hidden_dim, dtype=dtype, **torch_linear_init(cfg["input_dim"])
            )
        self.layers = [
            TransformerBlock(hidden_dim, cfg, deterministic=self.deterministic)
            for _ in range(cfg["num_layers"])
        ]
        if self.classify:
            self.classifier = ClassifierHead(
                cfg["mixer_dim"], cfg["output_dim"], cfg["pooling"]
            )
        else:
            self.decoder = nn.Dense(
                cfg["output_dim"], use_bias=False, dtype=dtype,
                **torch_linear_init(hidden_dim),
            )
        if self.dual:
            self.match = MATCH(cfg["mixer_dim"], cfg["output_dim"])
        if cfg["norm"] != "layer":
            raise RuntimeError(f"{cfg['norm']} norm not implemented yet!")
        self.norm = nn.LayerNorm(epsilon=1e-5)  # torch nn.LayerNorm eps parity
        self.drop = nn.Dropout(cfg["dropout"], deterministic=self.deterministic)

    def features(self, x):
        """Backbone features before the decoder head — the fused
        softmax-xent path consumes these (ops/fused_xent.py)."""
        if isinstance(x, tuple):
            # padded LRA batches arrive as (tokens, lengths); the reference's
            # torch path ignores lengths entirely (ref train.py:96-97 feeds X
            # only; ClassifierHead pools unmasked, ref models/common.py:88-115)
            x, _ = x
        if self.dual and x.ndim == 3 and jnp.issubdtype(x.dtype, jnp.integer):
            # retrieval pairs arrive as (B, 2, L): fold the pair axis into
            # the batch (the reference feeds a 2B batch, ref train/AAN collate)
            x = jnp.concatenate([x[:, 0], x[:, 1]], axis=0)
        x = self.encoder(x)
        x = self.drop(x)
        for layer in self.layers:
            x = layer(x)
        return self.norm(x)

    def __call__(self, x):
        x = self.features(x)
        if self.classify:
            x = self.classifier(x)
            if self.dual:
                x1, x2 = jnp.split(x, 2, axis=0)
                x = self.match(jnp.concatenate([x1, x2], axis=-1))
        else:
            x = self.decoder(x)
        return x
