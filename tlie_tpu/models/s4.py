"""S4: DPLR SSM with generating-function (FFT) convolution — pair-complex.

Same math as the reference's annotated-s4 port (ref models/s4.py): DPLR
HiPPO init, CNN mode evaluating the transfer function at the roots of unity
through four Cauchy reductions + inverse FFT (ref models/s4.py:43-79), RNN
mode via bilinear DPLR discretization + sequential scan (ref :16-40, :82-88).

TPU-native differences:
  * No complex dtype anywhere: Λ, P, B, C and all kernel math are (re, im)
    planes; complex matrix inverses use the real 2N×2N block embedding.
  * No `jnp.fft`: the iFFT and causal convolution run on the matmul-FFT
    (`ops/fft.py`).
  * The reference vmaps a scalar SSM over d_model channels
    (ref models/s4.py:183-189); here the module is natively multichannel —
    parameters carry the channel axis exactly where ``nn.vmap`` put them
    (axis 1: Lambda_re (N, H), log_step (1, H), C (N, H, 2), …) so reference
    checkpoints map directly — except P/B which the reference stores as
    complex arrays and we store with a trailing re/im axis (N, H, 2).

The analysis path (eigenvalues of the dense discretized Ā) reuses
:func:`discrete_dplr` below.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops import fft as mfft
from ..utils import cplx
from .initializers import log_step_initializer, make_dplr_hippo


# --------------------------------------------------------------------------
# DPLR discretization (pair-complex, used by RNN mode and by the analysis
# engine's S4 eigenvalue extractor; ref models/s4.py:16-40)
# --------------------------------------------------------------------------


def _cinv(m: cplx.Pair) -> cplx.Pair:
    """Inverse of a complex matrix via the real 2N×2N block embedding
    [[X, -Y], [Y, X]] — TPU has no complex linalg."""
    x, y = m
    n = x.shape[-1]
    top = jnp.concatenate([x, -y], axis=-1)
    bot = jnp.concatenate([y, x], axis=-1)
    block = jnp.concatenate([top, bot], axis=-2)
    inv = jnp.linalg.inv(block)
    return (inv[..., :n, :n], inv[..., n:, :n])


def _cmatpow(m: cplx.Pair, power: int) -> cplx.Pair:
    """m**power by repeated squaring with pair matmuls (power static)."""
    n = m[0].shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n), m[0].shape)
    result = (eye, jnp.zeros_like(eye))
    base = m
    p = power
    while p > 0:
        if p & 1:
            result = cplx.matmul(result, base)
        base = cplx.matmul(base, base)
        p >>= 1
    return result


def discrete_dplr(
    lam: cplx.Pair, p: cplx.Pair, q: cplx.Pair, b: cplx.Pair, c: cplx.Pair,
    step, L: int,
) -> Tuple[cplx.Pair, cplx.Pair, cplx.Pair]:
    """Bilinear discretization of the DPLR system (ref models/s4.py:16-40).

    lam/p/q/b/c: (N,) pairs; step: scalar. Returns (Ā (N,N), B̄ (N,1), C̄ (1,N)).
    """
    n = lam[0].shape[0]
    eye = jnp.eye(n)

    # A = diag(Λ) − P Q*
    pq = cplx.mul((p[0][:, None], p[1][:, None]), cplx.conj((q[0][None, :], q[1][None, :])))
    a = cplx.sub((jnp.diag(lam[0]), jnp.diag(lam[1])), pq)

    # forward Euler half: A0 = (2/Δ) I + A
    a0 = cplx.add((2.0 / step * eye, jnp.zeros_like(eye)), a)

    # backward Euler half: D = diag(1 / (2/Δ − Λ))
    d_diag = cplx.reciprocal((2.0 / step - lam[0], -lam[1]))
    d = (jnp.diag(d_diag[0]), jnp.diag(d_diag[1]))

    qc = cplx.conj((q[0][None, :], q[1][None, :]))  # (1, N)
    p2 = (p[0][:, None], p[1][:, None])  # (N, 1)

    qd = cplx.matmul(qc, d)  # (1, N)
    dp = cplx.matmul(d, p2)  # (N, 1)
    denom = cplx.reciprocal(cplx.add((jnp.ones((1, 1)), jnp.zeros((1, 1))), cplx.matmul(qd, p2)))
    correction = cplx.mul(
        cplx.matmul(dp, qd), (denom[0], denom[1])
    )
    a1 = cplx.sub(d, correction)

    ab = cplx.matmul(a1, a0)
    bb = cplx.scale(cplx.matmul(a1, (b[0][:, None], b[1][:, None])), 2.0)

    # C̄ = (C (I − Ā^L)^{-1}*)* — conjugations as in the reference
    ab_l = _cmatpow(ab, L)
    m = cplx.sub((eye, jnp.zeros_like(eye)), ab_l)
    cb = cplx.matmul((c[0][None, :], c[1][None, :]), cplx.conj(_cinv(m)))
    return ab, bb, cplx.conj(cb)


# --------------------------------------------------------------------------
# CNN-mode kernel (pair Cauchy + matmul iFFT; ref models/s4.py:43-68)
# --------------------------------------------------------------------------


def _cauchy_multichannel(v: cplx.Pair, g: cplx.Pair, lam: cplx.Pair) -> cplx.Pair:
    """k[h, l] = Σ_n v[n, h] / (g[h, l] − Λ[n, h]).

    v, lam: (N, H) pairs; g: (H, L) pair → (H, L) pair.  One fused
    broadcast-reduce over the (H, L, N) cube.
    """
    denom = (
        g[0][:, :, None] - lam[0].T[:, None, :],
        g[1][:, :, None] - lam[1].T[:, None, :],
    )
    r = cplx.reciprocal(denom)  # (H, L, N)
    vt = (v[0].T[:, None, :], v[1].T[:, None, :])  # (H, 1, N)
    prod = cplx.mul(vt, r)
    return (prod[0].sum(-1), prod[1].sum(-1))


def s4_kernel_dplr(
    lam: cplx.Pair, p: cplx.Pair, b: cplx.Pair, c: cplx.Pair, step, L: int
) -> jax.Array:
    """Length-L convolution kernels for all channels at once.

    lam/p/b/c: (N, H) pairs (c is C_tilde); step: (H,). Returns (H, L) real.
    """
    # roots of unity and the bilinear frequency map (host constants)
    k = np.arange(L)
    omega = np.exp(-2j * np.pi * k / L)
    g_base = (1.0 - omega) / (1.0 + omega)  # (L,)
    c_coef = 2.0 / (1.0 + omega)  # (L,)

    two_over_step = 2.0 / step  # (H,)
    g = (
        two_over_step[:, None] * jnp.asarray(g_base.real.astype(np.float32)),
        two_over_step[:, None] * jnp.asarray(g_base.imag.astype(np.float32)),
    )  # (H, L)

    a0 = cplx.conj(c)
    a1 = cplx.conj(p)
    b0, b1 = b, p

    k00 = _cauchy_multichannel(cplx.mul(a0, b0), g, lam)
    k01 = _cauchy_multichannel(cplx.mul(a0, b1), g, lam)
    k10 = _cauchy_multichannel(cplx.mul(a1, b0), g, lam)
    k11 = _cauchy_multichannel(cplx.mul(a1, b1), g, lam)

    one = (jnp.ones_like(k11[0]), jnp.zeros_like(k11[0]))
    at_roots = cplx.mul(
        (
            jnp.asarray(c_coef.real.astype(np.float32))[None, :],
            jnp.asarray(c_coef.imag.astype(np.float32))[None, :],
        ),
        cplx.sub(k00, cplx.mul(cplx.mul(k01, cplx.reciprocal(cplx.add(one, k11))), k10)),
    )  # (H, L)

    out = mfft.ifft(at_roots)  # (H, L) pair
    return out[0]


# --------------------------------------------------------------------------
# Module
# --------------------------------------------------------------------------


class S4(nn.Module):
    """Multichannel S4 layer; input (..., L, H) real → (..., L, H) real."""

    Lambda_re_init: np.ndarray  # (N,)
    Lambda_im_init: np.ndarray
    P_init_re: np.ndarray
    P_init_im: np.ndarray
    B_init_re: np.ndarray
    B_init_im: np.ndarray

    d_state: int
    d_model: int
    dt_min: float
    dt_max: float
    C_init: str
    l_max: int
    decode: bool = False

    def setup(self):
        n, h = self.d_state, self.d_model

        def tiled(v):
            return jnp.broadcast_to(jnp.asarray(v)[:, None], (n, h))

        self.Lambda_re = self.param("Lambda_re", lambda rng, s: tiled(self.Lambda_re_init), (n, h))
        self.Lambda_im = self.param("Lambda_im", lambda rng, s: tiled(self.Lambda_im_init), (n, h))
        self.P = self.param(
            "P",
            lambda rng, s: jnp.stack([tiled(self.P_init_re), tiled(self.P_init_im)], -1),
            (n, h, 2),
        )
        self.B = self.param(
            "B",
            lambda rng, s: jnp.stack([tiled(self.B_init_re), tiled(self.B_init_im)], -1),
            (n, h, 2),
        )

        if self.C_init == "lecun_normal":
            c_init = jax.nn.initializers.variance_scaling(
                1.0, "fan_in", "truncated_normal", in_axis=0, out_axis=(1, 2)
            )
        elif self.C_init == "complex_normal":
            c_init = jax.nn.initializers.normal(stddev=0.5**0.5)
        else:
            raise NotImplementedError(f"C_init method {self.C_init} not implemented")
        self.C = self.param("C", c_init, (n, h, 2))
        self.D = self.param("D", nn.initializers.ones, (1, h))
        self.log_step = self.param(
            "log_step",
            lambda rng, s: log_step_initializer(self.dt_min, self.dt_max)(rng, (1, h)),
            (1, h),
        )

    def _parameters_pair(self):
        lam = (jnp.clip(self.Lambda_re, max=-1e-4), self.Lambda_im)
        p = (self.P[..., 0], self.P[..., 1])
        b = (self.B[..., 0], self.B[..., 1])
        c = (self.C[..., 0], self.C[..., 1])
        step = jnp.exp(self.log_step[0])  # (H,)
        return lam, p, b, c, step

    def __call__(self, u):
        lam, p, b, c, step = self._parameters_pair()
        if not self.decode:
            K = s4_kernel_dplr(lam, p, b, c, step, self.l_max)  # (H, L)
            ut = jnp.swapaxes(u, -1, -2)  # (..., H, L)
            n2 = 2 * self.l_max
            ud = mfft.fft(ut, n=n2)
            kd = mfft.fft(K, n=n2)
            y = mfft.ifft(cplx.mul(ud, kd))[0][..., : self.l_max]
            y = jnp.swapaxes(y, -1, -2)
            return y + self.D[0] * u

        # RNN / decode mode: per-channel dense recurrence
        per_channel = jax.vmap(
            lambda l, pp, bb, cc, s: discrete_dplr(l, pp, pp, bb, cc, s, self.l_max),
            in_axes=(1, 1, 1, 1, 0),
            out_axes=0,
        )
        lam_t = tuple(x for x in lam)
        ab, bb, cb = per_channel(lam_t, p, b, c, step)  # (H, N, N), (H, N, 1), (H, 1, N)

        def time_step(x, u_t):
            # x: pair (..., H, N); u_t: (..., H)
            xr = jnp.einsum("hnm,...hm->...hn", ab[0], x[0]) - jnp.einsum(
                "hnm,...hm->...hn", ab[1], x[1]
            )
            xi = jnp.einsum("hnm,...hm->...hn", ab[0], x[1]) + jnp.einsum(
                "hnm,...hm->...hn", ab[1], x[0]
            )
            xr = xr + bb[0][..., 0] * u_t[..., None]
            xi = xi + bb[1][..., 0] * u_t[..., None]
            yr = jnp.einsum("hn,...hn->...h", cb[0][:, 0, :], xr) - jnp.einsum(
                "hn,...hn->...h", cb[1][:, 0, :], xi
            )
            return (xr, xi), yr

        lead = u.shape[:-2]
        x0 = (
            jnp.zeros(lead + (self.d_model, self.d_state)),
            jnp.zeros(lead + (self.d_model, self.d_state)),
        )
        us = jnp.moveaxis(u, -2, 0)  # (L, ..., H)
        _, ys = jax.lax.scan(time_step, x0, us)
        y = jnp.moveaxis(ys, 0, -2)
        return y + self.D[0] * u


def init_S4(d_state, d_model, **cfg):
    """Registry factory (ref models/s4.py:192-215)."""
    lam, p, b, _, _ = make_dplr_hippo(d_state)
    return partial(
        S4,
        d_state=d_state,
        d_model=d_model,
        Lambda_re_init=lam.real.astype(np.float32),
        Lambda_im_init=lam.imag.astype(np.float32),
        P_init_re=p.real.astype(np.float32),
        P_init_im=p.imag.astype(np.float32),
        B_init_re=b.real.astype(np.float32),
        B_init_im=b.imag.astype(np.float32),
        C_init=cfg.get("C_init", "complex_normal"),
        dt_min=cfg.get("dt_min", 0.001),
        dt_max=cfg.get("dt_max", 0.1),
        l_max=cfg.get("seq_len", 100),
        decode=cfg.get("decode", False),
    )
