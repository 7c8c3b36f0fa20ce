"""Linear Recurrent Unit (Orvieto et al. 2023) — TPU-native, pair-complex.

Same parameterisation and initialisation as the reference
(ref models/lru.py:42-113): λ = exp(−exp(ν_log) + i·exp(θ_log)) on a ring
[r_min, r_max], γ-normalised complex input projection, real readout.  The
recurrence runs through :func:`tlie_tpu.ops.diag_linear_scan` (Pallas fused
kernel on TPU) with the complex state carried as (re, im) planes — the TPU
backend has no complex dtype.

Unlike the reference (per-example (L, H) modules wrapped in ``nn.vmap``),
this module is natively batched: input (..., L, d_model), all projections are
batched matmuls on the MXU.  The flax parameter tree (``nu_log``,
``theta_log``, ``gamma_log``, ``B_re``, ``B_im``, ``C_re``, ``C_im``, ``D``)
is identical, so reference orbax checkpoints restore directly.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.scan import diag_linear_scan
from .initializers import (
    gamma_log_init,
    matrix_init,
    nu_log_init,
    theta_log_init,
)


class LRU(nn.Module):
    d_hidden: int
    d_model: int
    r_min: float = 0.0
    r_max: float = 1.0
    max_phase: float = 6.28
    scan_impl: Optional[str] = None

    def setup(self):
        self.theta_log = self.param(
            "theta_log", partial(theta_log_init, max_phase=self.max_phase), (self.d_hidden,)
        )
        self.nu_log = self.param(
            "nu_log", partial(nu_log_init, r_min=self.r_min, r_max=self.r_max), (self.d_hidden,)
        )
        self.gamma_log = self.param(
            "gamma_log", gamma_log_init, (self.nu_log, self.theta_log)
        )
        self.B_re = self.param(
            "B_re",
            partial(matrix_init, normalization=jnp.sqrt(2 * self.d_model)),
            (self.d_hidden, self.d_model),
        )
        self.B_im = self.param(
            "B_im",
            partial(matrix_init, normalization=jnp.sqrt(2 * self.d_model)),
            (self.d_hidden, self.d_model),
        )
        self.C_re = self.param(
            "C_re",
            partial(matrix_init, normalization=jnp.sqrt(self.d_hidden)),
            (self.d_model, self.d_hidden),
        )
        self.C_im = self.param(
            "C_im",
            partial(matrix_init, normalization=jnp.sqrt(self.d_hidden)),
            (self.d_model, self.d_hidden),
        )
        self.D = self.param("D", matrix_init, (self.d_model,))

    def __call__(self, u):
        """u: (..., L, d_model) real → (..., L, d_model) real.

        h_t = λ ⊙ h_{t-1} + γ ⊙ B u_t ;  y_t = Re[C h_t] + D ⊙ u_t
        """
        L = u.shape[-2]
        mag = jnp.exp(-jnp.exp(self.nu_log))
        phase = jnp.exp(self.theta_log)
        lam = (mag * jnp.cos(phase), mag * jnp.sin(phase))
        gamma = jnp.exp(self.gamma_log)[:, None]

        bn_re = self.B_re * gamma
        bn_im = self.B_im * gamma
        bu = (u @ bn_re.T, u @ bn_im.T)  # (..., L, N) pair

        a = (
            jnp.broadcast_to(lam[0], (L, self.d_hidden)),
            jnp.broadcast_to(lam[1], (L, self.d_hidden)),
        )
        h_re, h_im = diag_linear_scan(a, bu, impl=self.scan_impl)

        y = h_re @ self.C_re.T - h_im @ self.C_im.T
        return y + self.D * u


def init_LRU(d_state, d_model, **cfg):
    """Registry factory (ref models/lru.py:101-113): returns a partial the
    backbone instantiates per layer."""
    return partial(
        LRU,
        d_state,
        d_model,
        cfg.get("r_min", 0.0),
        cfg.get("r_max", 1.0),
        cfg.get("max_phase", 6.28),
        scan_impl=cfg.get("scan_impl"),
    )
