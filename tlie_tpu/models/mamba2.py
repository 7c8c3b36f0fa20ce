"""Mamba-2 / SSD model family (+ the paper's pseudo-LTI variant).

Flax counterpart of the reference's torch Mamba stack (ref models/mamba.py):
fused in_proj → [x, B, C, dt], softplus-dt with log-uniform-initialised
bias, depthwise causal conv on xBC, chunked selective scan, out_proj — the
scan runs through the MXU-first chunked SSD op (``ops/ssd.py``), replacing
the Triton ``mamba_chunk_scan_combined``.

``SSD_LTI`` is the pseudo-LTI ablation (ref models/mamba.py:156-299):
per-head constant β=1 as the step, A = −softplus(A) with init uniform in
(−8, −2), and the input-dependent dt folded into B instead of the decay.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.scan import diag_linear_scan
from ..ops.ssd import ssd_chunked_scan
from .layers import (GLU, MATCH, DepthwiseCausalConv, TokenEmbeddings,
                     torch_linear_init)


def _dt_bias_init(rng, nheads, dt_min, dt_max, dt_init_floor=1e-4):
    """Inverse-softplus of a log-uniform dt sample (ref models/mamba.py:71-78)."""
    u = jax.random.uniform(rng, (nheads,))
    dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
    dt = jnp.clip(dt, min=dt_init_floor)
    return dt + jnp.log(-jnp.expm1(-dt))


class SSD(nn.Module):
    """Selective state-space duality block core (ref models/mamba.py:25-154)."""

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 1
    headdim: int = 32
    ngroups: int = 1
    A_init_range: tuple = (1, 16)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    # Post-softplus dt clamp; (0, inf) — every reference config — is a no-op
    # (ref models/mamba.py:38,125-128)
    dt_limit: tuple = (0.0, float("inf"))
    # Zeros-init learnable h0 of shape (H, P, N), broadcast over batch
    # (ref models/mamba.py:39,66-67,119)
    learnable_init_states: bool = False
    # None → the op's shape-aware auto choice (ops/ssd.py ``_auto_chunk``,
    # up to 1024 under an HBM budget — measured monotonically faster than the
    # reference kernel's fixed 256 at LM shapes); explicit values win
    chunk_size: Optional[int] = None
    bias: bool = False
    deterministic: bool = True
    dtype: Optional[Any] = None

    @property
    def d_inner(self):
        return self.expand * self.d_model

    @property
    def nheads(self):
        return self.d_inner // self.headdim

    @nn.compact
    def __call__(self, u):
        d_inner, nheads = self.d_inner, self.nheads
        g, n = self.ngroups, self.d_state
        conv_dim = d_inner + 2 * g * n

        d_in_proj = d_inner + 2 * g * n + nheads
        xbcdt = nn.Dense(
            d_in_proj, use_bias=self.bias, name="in_proj", dtype=self.dtype,
            **torch_linear_init(self.d_model),
        )(u)

        dt_bias = self.param(
            "dt_bias",
            lambda rng, shape: _dt_bias_init(
                rng, shape[0], self.dt_min, self.dt_max, self.dt_init_floor
            ),
            (nheads,),
        )
        A_log = self.param(
            "A_log",
            lambda rng, shape: jnp.log(
                jax.random.uniform(
                    rng, shape, minval=self.A_init_range[0], maxval=self.A_init_range[1]
                )
            ),
            (nheads,),
        )
        D = self.param("D", nn.initializers.ones, (nheads,))

        xBC = xbcdt[..., :conv_dim]
        dt = xbcdt[..., conv_dim:]
        # dt/A decay math always runs f32 (bf16 xbcdt + f32 dt_bias promotes)
        dt = jax.nn.softplus(dt + dt_bias)  # (B, L, nheads)

        if self.d_conv > 0:
            xBC = jax.nn.silu(
                DepthwiseCausalConv(
                    conv_dim, self.d_conv, name="conv1d", dtype=self.dtype
                )(xBC)
            )

        x = xBC[..., :d_inner]
        B_mat = xBC[..., d_inner : d_inner + g * n]
        C_mat = xBC[..., d_inner + g * n :]

        bsz, L = x.shape[0], x.shape[1]
        initial_states = None
        if self.learnable_init_states:
            h0 = self.param(
                "init_states", nn.initializers.zeros,
                (nheads, self.headdim, n),
            )
            initial_states = jnp.broadcast_to(h0, (bsz,) + h0.shape)
        y = ssd_chunked_scan(
            x.reshape(bsz, L, nheads, self.headdim),
            dt,
            -jnp.exp(A_log),
            B_mat.reshape(bsz, L, g, n),
            C_mat.reshape(bsz, L, g, n),
            chunk_size=self.chunk_size,
            D=D,
            initial_states=initial_states,
            dt_limit=self.dt_limit,
        )
        y = y.reshape(bsz, L, d_inner)
        return nn.Dense(
            self.d_model, use_bias=self.bias, name="out_proj", dtype=self.dtype,
            **torch_linear_init(d_inner),
        )(y)


class SSD_LTI(nn.Module):
    """Pseudo-LTI SSD: constant unit step, input-dependent dt folded into B
    (ref models/mamba.py:156-299)."""

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 1
    headdim: int = 32
    ngroups: int = 1
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    # Clamps the kernel's step input — here the constant β (ref
    # models/mamba.py:168-169,264-268 passes dt_limit with beta as dt)
    dt_limit: tuple = (0.0, float("inf"))
    learnable_init_states: bool = False
    chunk_size: Optional[int] = None
    bias: bool = False
    deterministic: bool = True
    dtype: Optional[Any] = None

    @property
    def d_inner(self):
        return self.expand * self.d_model

    @property
    def nheads(self):
        return self.d_inner // self.headdim

    @nn.compact
    def __call__(self, u):
        d_inner, nheads = self.d_inner, self.nheads
        g, n = self.ngroups, self.d_state
        conv_dim = d_inner + 2 * g * n
        assert (n * g) % nheads == 0
        khead_dim = (n * g) // nheads

        d_in_proj = d_inner + 2 * g * n + g
        xbcdt = nn.Dense(
            d_in_proj, use_bias=self.bias, name="in_proj", dtype=self.dtype,
            **torch_linear_init(self.d_model),
        )(u)

        dt_bias = self.param(
            "dt_bias",
            lambda rng, shape: _dt_bias_init(
                rng, shape[0], self.dt_min, self.dt_max, self.dt_init_floor
            ),
            (nheads,),
        )
        A = self.param(
            "A",
            lambda rng, shape: jax.random.uniform(rng, shape, minval=-8.0, maxval=-2.0),
            (nheads,),
        )
        D = self.param("D", nn.initializers.ones, (nheads,))

        xBC = xbcdt[..., :conv_dim]
        dt = xbcdt[..., conv_dim:]  # (B, L, g) broadcast-added to (nheads,)
        dt = jax.nn.softplus(dt + dt_bias)  # (B, L, nheads)

        if self.d_conv > 0:
            xBC = jax.nn.silu(
                DepthwiseCausalConv(
                    conv_dim, self.d_conv, name="conv1d", dtype=self.dtype
                )(xBC)
            )

        x = xBC[..., :d_inner]
        B_mat = xBC[..., d_inner : d_inner + g * n]
        C_mat = xBC[..., d_inner + g * n :]

        bsz, L = x.shape[0], x.shape[1]
        # fold the input-dependent step into B; the scan uses β ≡ 1
        dt_full = jnp.repeat(dt, khead_dim, axis=-1)  # (B, L, g*n)
        B_mat = (dt_full * B_mat).astype(x.dtype)
        beta = jnp.ones((bsz, L, nheads))

        initial_states = None
        if self.learnable_init_states:
            h0 = self.param(
                "init_states", nn.initializers.zeros,
                (nheads, self.headdim, n),
            )
            initial_states = jnp.broadcast_to(h0, (bsz,) + h0.shape)
        y = ssd_chunked_scan(
            x.reshape(bsz, L, nheads, self.headdim),
            beta,
            -jax.nn.softplus(A),
            B_mat.reshape(bsz, L, g, n),
            C_mat.reshape(bsz, L, g, n),
            chunk_size=self.chunk_size,
            D=D,
            initial_states=initial_states,
            dt_limit=self.dt_limit,
        )
        y = y.reshape(bsz, L, d_inner)
        return nn.Dense(
            self.d_model, use_bias=self.bias, name="out_proj", dtype=self.dtype,
            **torch_linear_init(d_inner),
        )(y)


class Mamba1(nn.Module):
    """Mamba-1 selective-scan layer (``version: "mamba1"``).

    TPU-native counterpart of the reference's Mamba-1 branch
    (ref models/mamba.py:304-305, which wraps ``mamba_ssm``'s torch Mamba-1
    layer); the parameter layout and init distributions follow that layer:
    ``in_proj`` → [x, z], depthwise causal ``conv1d`` + SiLU on x,
    ``x_proj`` → [dt, B, C], low-rank ``dt_proj`` whose bias carries the
    inverse-softplus log-uniform Δ init, S4D-real ``A_log`` = log(1..N) per
    channel, y·SiLU(z) gate, ``out_proj``.

    The recurrence h_t[d,n] = exp(Δ_t[d]·A[d,n])·h_{t-1}[d,n] +
    Δ_t[d]·B_t[n]·x_t[d] is diagonal over the (d_inner, d_state) lattice but
    — unlike SSD — A varies over the state axis, so there is no head-granular
    matmul (MXU) form; the fused diagonal associative scan (ops/scan.py, the
    K5 machinery with its Pallas TPU kernel) IS the native decomposition.
    State lattice is materialised as (B, L, d_inner, d_state) f32: fine at
    the eigen-spectroscopy model scales this family targets; very long
    contexts should chunk over L.

    The reference's own analysis cannot extract Mamba-1 eigenvalues (its
    ``get_eig_mamba2`` assumes the SSD in_proj layout, ref
    analysis/eval_eig.py:176-190); this framework's can — see
    ``analysis/extractors.eig_mamba1``."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None  # default ceil(d_model / 16), as mamba_ssm
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    bias: bool = False
    deterministic: bool = True
    dtype: Optional[Any] = None

    @property
    def d_inner(self):
        return self.expand * self.d_model

    @property
    def rank(self):
        return self.dt_rank or -(-self.d_model // 16)

    @nn.compact
    def __call__(self, u):
        d_inner, n, r = self.d_inner, self.d_state, self.rank

        xz = nn.Dense(
            2 * d_inner, use_bias=self.bias, name="in_proj", dtype=self.dtype,
            **torch_linear_init(self.d_model),
        )(u)
        x, z = jnp.split(xz, 2, axis=-1)

        if self.d_conv > 0:
            x = jax.nn.silu(
                DepthwiseCausalConv(
                    d_inner, self.d_conv, name="conv1d", dtype=self.dtype
                )(x)
            )

        x_db = nn.Dense(
            r + 2 * n, use_bias=False, name="x_proj", dtype=self.dtype,
            **torch_linear_init(d_inner),
        )(x)
        dt_lr = x_db[..., :r]
        B_mat = x_db[..., r : r + n]
        C_mat = x_db[..., r + n :]

        # dt_proj: kernel U(±rank^-1/2) (mamba_ssm dt_init="random"), bias =
        # inverse-softplus of a log-uniform Δ sample; runs f32 regardless of
        # compute dtype — the decay math is always full precision (as in SSD)
        dt_std = r ** -0.5
        dt = nn.Dense(
            d_inner, use_bias=True, name="dt_proj",
            kernel_init=lambda rng, shape, dtype=jnp.float32: jax.random.uniform(
                rng, shape, dtype, minval=-dt_std, maxval=dt_std
            ),
            bias_init=lambda rng, shape, dtype=jnp.float32: _dt_bias_init(
                rng, shape[0], self.dt_min, self.dt_max, self.dt_init_floor
            ),
        )(dt_lr.astype(jnp.float32))
        dt = jax.nn.softplus(dt)  # (B, L, d_inner)

        # S4D-real init: A[d, :] = -(1..N) for every channel
        A_log = self.param(
            "A_log",
            lambda rng, shape: jnp.broadcast_to(
                jnp.log(jnp.arange(1, n + 1, dtype=jnp.float32)), shape
            ),
            (d_inner, n),
        )
        D = self.param("D", nn.initializers.ones, (d_inner,))

        a = jnp.exp(dt[..., None] * (-jnp.exp(A_log)))  # (B, L, d_inner, N)
        bx = (dt * x.astype(jnp.float32))[..., None] * B_mat.astype(
            jnp.float32
        )[..., None, :]
        h = diag_linear_scan(a, bx, axis=1)
        y = jnp.einsum("bldn,bln->bld", h, C_mat.astype(jnp.float32))
        y = y + D * x.astype(jnp.float32)
        y = y * jax.nn.silu(z.astype(jnp.float32))
        if self.dtype is not None:
            y = y.astype(self.dtype)

        return nn.Dense(
            self.d_model, use_bias=self.bias, name="out_proj", dtype=self.dtype,
            **torch_linear_init(d_inner),
        )(y)


class MambaBlock(nn.Module):
    """Residual block: [norm] → mamba → GELU → [GLU] → residual → [norm]
    (ref models/mamba.py:301-340)."""

    version: str
    hidden_dim: int
    state_dim: int
    headdim: int
    conv_dim: int
    expansion: int
    dropout: float
    glu: bool
    norm: str
    prenorm: bool
    pseudoLTI: bool
    ngroups: int = 1
    chunk_size: Optional[int] = None
    dt_limit: tuple = (0.0, float("inf"))
    learnable_init_states: bool = False
    deterministic: bool = True
    dtype: Optional[Any] = None

    def setup(self):
        if self.version == "mamba1":
            # ref models/mamba.py:304-305 (only d_model/d_state/d_conv/expand
            # are forwarded to the Mamba-1 layer there too)
            self.mamba = Mamba1(
                d_model=self.hidden_dim,
                d_state=self.state_dim,
                d_conv=self.conv_dim,
                expand=self.expansion,
                deterministic=self.deterministic,
                dtype=self.dtype,
            )
        elif self.version == "mamba2":
            cls = SSD_LTI if self.pseudoLTI else SSD
            self.mamba = cls(
                d_model=self.hidden_dim,
                d_state=self.state_dim,
                d_conv=self.conv_dim,
                expand=self.expansion,
                headdim=self.headdim,
                ngroups=self.ngroups,
                chunk_size=self.chunk_size,
                dt_limit=self.dt_limit,
                learnable_init_states=self.learnable_init_states,
                deterministic=self.deterministic,
                dtype=self.dtype,
            )
        else:
            raise RuntimeError(f"Non supported version {self.version}")
        self.glu_layer = (
            GLU(deterministic=self.deterministic, dtype=self.dtype)
            if self.glu
            else None
        )
        if self.norm != "layer":
            raise RuntimeError("only layer norm is supported for Mamba blocks")
        self.norm_layer = nn.LayerNorm(epsilon=1e-5)  # torch nn.LayerNorm eps parity
        self.drop = nn.Dropout(self.dropout, deterministic=self.deterministic)

    def __call__(self, x):
        skip = x
        if self.prenorm:
            x = self.norm_layer(x)
        x = self.mamba(x)
        x = self.drop(nn.gelu(x, approximate=False))  # torch nn.GELU() is erf-exact
        if self.glu_layer is not None:
            x = self.glu_layer(x)
        x = self.drop(x)
        x = x + skip
        if not self.prenorm:
            x = self.norm_layer(x)
        return x


class Mamba(nn.Module):
    """Full Mamba model (ref models/mamba.py:342-389); cfg is the reference
    model-config dict."""

    cfg: Dict[str, Any]
    deterministic: bool = True

    def setup(self):
        cfg = self.cfg
        hidden_dim = cfg["hidden_dim"]
        headdim = hidden_dim // cfg["num_heads"]
        self.pooling = cfg["pooling"]
        self.dual = cfg.get("dual", False)
        # opt-in mixed precision: activations/matmuls bf16, params and the
        # decay/normalizer math f32 (see README performance notes)
        dtype = jnp.bfloat16 if cfg.get("compute_dtype") == "bfloat16" else None

        if cfg.get("token_embedding", False):
            self.encoder = TokenEmbeddings(hidden_dim, cfg["vocab_size"], 0, dtype=dtype)
        else:
            self.encoder = nn.Dense(
                hidden_dim, dtype=dtype, **torch_linear_init(cfg["input_dim"])
            )
        self.blocks = [
            MambaBlock(
                version=cfg["version"],
                hidden_dim=hidden_dim,
                state_dim=cfg["state_dim"],
                headdim=headdim,
                conv_dim=cfg["conv_dim"],
                expansion=cfg["expansion"],
                dropout=cfg["dropout"],
                glu=cfg["glu"],
                norm=cfg["norm"],
                prenorm=cfg["prenorm"],
                pseudoLTI=cfg.get("pseudoLTI", False),
                ngroups=cfg.get("ngroups", 1),
                chunk_size=cfg.get("chunk_size"),
                dt_limit=tuple(cfg.get("dt_limit", (0.0, float("inf")))),
                learnable_init_states=cfg.get("learnable_init_states", False),
                deterministic=self.deterministic,
                dtype=dtype,
            )
            for _ in range(cfg["num_layers"])
        ]
        self.decoder = nn.Dense(
            cfg["output_dim"], dtype=dtype, **torch_linear_init(hidden_dim)
        )
        if self.dual:
            self.match = MATCH(cfg["output_dim"], cfg["output_dim"])

    def features(self, x):
        """Backbone features before pooling/decoder (fused-xent path)."""
        if isinstance(x, tuple):
            # (tokens, lengths) from padded LRA batches — lengths ignored,
            # matching the reference torch path (ref train.py:96-97)
            x, _ = x
        if self.dual and x.ndim == 3 and jnp.issubdtype(x.dtype, jnp.integer):
            x = jnp.concatenate([x[:, 0], x[:, 1]], axis=0)
        x = self.encoder(x)
        for block in self.blocks:
            x = block(x)
        return x

    def __call__(self, x):
        x = self.features(x)
        if self.pooling == "mean":
            x = jnp.mean(x, axis=-2)
        elif self.pooling == "max":
            x = jnp.max(x, axis=-2)
        elif self.pooling == "last":
            x = x[..., -1, :]
        x = self.decoder(x)
        if self.dual:
            x1, x2 = jnp.split(x, 2, axis=0)
            x = self.match(jnp.concatenate([x1, x2], axis=-1))
        return x
