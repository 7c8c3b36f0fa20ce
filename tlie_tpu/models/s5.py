"""S5: MIMO diagonal SSM with HiPPO block-diagonal init — pair-complex, batched.

Same math and parameter layout as the reference (ref models/s5.py): complex
diagonal state matrix Λ from block-wise DPLR-HiPPO eigenvalues (with optional
conjugate-symmetry halving), V-projected B and C stored as trailing-(re, im)
real tensors, per-state learnable log-timescales, ZOH or bilinear
discretization performed at apply time, recurrence via the shared
parallel-scan op.  Natively batched over (..., L, H); the complex scan runs
as (re, im) planes through the fused Pallas kernel on TPU.

Parameter tree (``Lambda_re``, ``Lambda_im``, ``B``, ``C``/``C1``/``C2``,
``D``, ``log_step``) matches the reference checkpoints.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.scan import diag_linear_scan
from ..utils import cplx
from .initializers import (
    init_cv,
    init_log_steps,
    init_vinv_b,
    make_dplr_hippo,
    trunc_standard_normal,
)


def discretize_zoh(lam: cplx.Pair, b_tilde: cplx.Pair, step):
    """Zero-order-hold: Λ̄ = exp(ΛΔ), B̄ = Λ⁻¹(Λ̄ − 1)B (ref models/s5.py:34-47)."""
    lam_bar = cplx.exp(cplx.scale(lam, step))
    coeff = cplx.mul(cplx.reciprocal(lam), cplx.sub(lam_bar, (jnp.ones_like(lam[0]), jnp.zeros_like(lam[0]))))
    b_bar = cplx.mul((coeff[0][..., None], coeff[1][..., None]), b_tilde)
    return lam_bar, b_bar


def discretize_bilinear(lam: cplx.Pair, b_tilde: cplx.Pair, step):
    """Tustin transform (ref models/s5.py:16-31)."""
    half = cplx.scale(lam, step / 2.0)
    one = (jnp.ones_like(lam[0]), jnp.zeros_like(lam[0]))
    bl = cplx.reciprocal(cplx.sub(one, half))
    lam_bar = cplx.mul(bl, cplx.add(one, half))
    coeff = cplx.scale(bl, step)
    b_bar = cplx.mul((coeff[0][..., None], coeff[1][..., None]), b_tilde)
    return lam_bar, b_bar


class S5SSM(nn.Module):
    # HiPPO-derived init constants (host numpy, complex split into planes)
    Lambda_re_init: np.ndarray
    Lambda_im_init: np.ndarray
    V_re: np.ndarray
    V_im: np.ndarray
    Vinv_re: np.ndarray
    Vinv_im: np.ndarray

    H: int
    P: int
    C_init: str
    discretization: str
    dt_min: float
    dt_max: float
    conj_sym: bool = True
    clip_eigs: bool = False
    bidirectional: bool = False
    scan_impl: Optional[str] = None

    def setup(self):
        local_p = 2 * self.P if self.conj_sym else self.P

        self.Lambda_re = self.param(
            "Lambda_re", lambda rng, shape: jnp.asarray(self.Lambda_re_init), (None,)
        )
        self.Lambda_im = self.param(
            "Lambda_im", lambda rng, shape: jnp.asarray(self.Lambda_im_init), (None,)
        )

        self.B = self.param(
            "B",
            lambda rng, shape: init_vinv_b(
                nn.initializers.lecun_normal(), rng, shape, self.Vinv_re, self.Vinv_im
            ),
            (local_p, self.H),
        )

        if self.C_init == "complex_normal":
            c_shape = (self.H, 2 * self.P if self.bidirectional else self.P, 2)
            self.C = self.param("C", nn.initializers.normal(stddev=0.5**0.5), c_shape)
        elif self.C_init in ("trunc_standard_normal", "lecun_normal"):
            c_fun = (
                trunc_standard_normal
                if self.C_init == "trunc_standard_normal"
                else nn.initializers.lecun_normal()
            )
            c_shape = (self.H, local_p, 2)
            if self.bidirectional:
                self.C1 = self.param(
                    "C1", lambda rng, shape: init_cv(c_fun, rng, shape, self.V_re, self.V_im), c_shape
                )
                self.C2 = self.param(
                    "C2", lambda rng, shape: init_cv(c_fun, rng, shape, self.V_re, self.V_im), c_shape
                )
            else:
                self.C = self.param(
                    "C", lambda rng, shape: init_cv(c_fun, rng, shape, self.V_re, self.V_im), c_shape
                )
        else:
            raise NotImplementedError(f"C_init method {self.C_init} not implemented")

        self.D = self.param("D", nn.initializers.normal(stddev=1.0), (self.H,))
        self.log_step = self.param(
            "log_step", init_log_steps, (self.P, self.dt_min, self.dt_max)
        )

    def _c_tilde(self) -> cplx.Pair:
        if self.bidirectional and self.C_init != "complex_normal":
            c1 = (self.C1[..., 0], self.C1[..., 1])
            c2 = (self.C2[..., 0], self.C2[..., 1])
            return (
                jnp.concatenate([c1[0], c2[0]], axis=-1),
                jnp.concatenate([c1[1], c2[1]], axis=-1),
            )
        return (self.C[..., 0], self.C[..., 1])

    def __call__(self, u):
        """u: (..., L, H) real → (..., L, H) real."""
        lam_re = (
            jnp.clip(self.Lambda_re, max=-1e-4) if self.clip_eigs else self.Lambda_re
        )
        lam = (lam_re, self.Lambda_im)
        b_tilde = (self.B[..., 0], self.B[..., 1])
        step = jnp.exp(self.log_step[:, 0])

        if self.discretization == "zoh":
            lam_bar, b_bar = discretize_zoh(lam, b_tilde, step)
        elif self.discretization == "bilinear":
            lam_bar, b_bar = discretize_bilinear(lam, b_tilde, step)
        else:
            raise NotImplementedError(
                f"Discretization method {self.discretization} not implemented"
            )

        L = u.shape[-2]
        bu = (u @ b_bar[0].T, u @ b_bar[1].T)  # (..., L, P)
        a = (
            jnp.broadcast_to(lam_bar[0], (L, self.P)),
            jnp.broadcast_to(lam_bar[1], (L, self.P)),
        )
        xs = diag_linear_scan(a, bu, impl=self.scan_impl)
        if self.bidirectional:
            xs2 = diag_linear_scan(a, bu, impl=self.scan_impl, reverse=True)
            xs = (
                jnp.concatenate([xs[0], xs2[0]], axis=-1),
                jnp.concatenate([xs[1], xs2[1]], axis=-1),
            )

        c_tilde = self._c_tilde()
        ys = xs[0] @ c_tilde[0].T - xs[1] @ c_tilde[1].T
        if self.conj_sym:
            ys = 2 * ys
        return ys + self.D * u


def init_S5(d_state, d_model, **cfg):
    """Registry factory (ref models/s5.py:253-296): block-diagonal HiPPO init
    with optional conjugate-symmetry halving, computed host-side in numpy."""
    c_init = cfg.get("C_init", "lecun_normal")
    discretization = cfg.get("discretization", "zoh")
    dt_min = cfg.get("dt_min", 0.001)
    dt_max = cfg.get("dt_max", 0.1)
    conj_sym = cfg.get("conj_sym", True)
    clip_eigs = cfg.get("clip_eigs", False)
    bidirectional = cfg.get("bidirectional", False)
    blocks = cfg.get("num_blocks", 8)

    block_size = int(d_state / blocks)
    lam, _, _, v, _ = make_dplr_hippo(block_size)

    if conj_sym:
        block_size = block_size // 2
        d_state = d_state // 2

    lam = lam[:block_size]
    v = v[:, :block_size]
    vc = v.conj().T

    lam_full = np.tile(lam, blocks)

    def blockdiag(m, reps):
        rows, cols = m.shape
        out = np.zeros((rows * reps, cols * reps), dtype=m.dtype)
        for i in range(reps):
            out[i * rows : (i + 1) * rows, i * cols : (i + 1) * cols] = m
        return out

    v_full = blockdiag(v, blocks)
    vinv_full = blockdiag(vc, blocks)

    return partial(
        S5SSM,
        H=d_model,
        P=d_state,
        Lambda_re_init=np.ascontiguousarray(lam_full.real.astype(np.float32)),
        Lambda_im_init=np.ascontiguousarray(lam_full.imag.astype(np.float32)),
        V_re=np.ascontiguousarray(v_full.real.astype(np.float32)),
        V_im=np.ascontiguousarray(v_full.imag.astype(np.float32)),
        Vinv_re=np.ascontiguousarray(vinv_full.real.astype(np.float32)),
        Vinv_im=np.ascontiguousarray(vinv_full.imag.astype(np.float32)),
        C_init=c_init,
        discretization=discretization,
        dt_min=dt_min,
        dt_max=dt_max,
        conj_sym=conj_sym,
        clip_eigs=clip_eigs,
        bidirectional=bidirectional,
        scan_impl=cfg.get("scan_impl"),
    )
