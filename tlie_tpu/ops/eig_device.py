"""On-device complex eigenvalues: Hessenberg + shifted QR in pair arithmetic.

The K8 north-star kernel (SURVEY.md §2.2): the reference hops to host numpy
for the eigenvalues of S4's dense discretized Ā (ref eval_eig.py:296); this
implements the dense nonsymmetric eigensolver natively in JAX — no complex
dtype, no LAPACK, no host callback — so spectra of many checkpoints/layers
batch on the TPU via vmap:

  1. unitary Hessenberg reduction by Householder reflections,
  2. Wilkinson-shifted QR iteration with Givens rotations and trailing
     deflation, run with static shapes (the active block is tracked by a
     traced index; retired rotations become identities).

Everything is (re, im) pairs of real arrays; matrices up to a few hundred
states (the sizes this framework analyses) converge in ≤ ~15 sweeps per
eigenvalue at fp32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Pair = Tuple[jax.Array, jax.Array]

_EPS = 1e-7


def _cmul(ar, ai, br, bi):
    return ar * br - ai * bi, ar * bi + ai * br


def _cdiv(ar, ai, br, bi):
    d = br * br + bi * bi
    return (ar * br + ai * bi) / d, (ai * br - ar * bi) / d


def _csqrt(ar, ai):
    """Principal square root of a complex number (pairwise)."""
    r = jnp.sqrt(ar * ar + ai * ai)
    re = jnp.sqrt(jnp.maximum((r + ar) / 2, 0.0))
    im_mag = jnp.sqrt(jnp.maximum((r - ar) / 2, 0.0))
    return re, jnp.where(ai >= 0, im_mag, -im_mag)


def _hessenberg(a: Pair) -> Pair:
    """Unitary reduction to upper Hessenberg form."""
    n = a[0].shape[-1]
    idx = jnp.arange(n)

    def body(k, A):
        A_re, A_im = A
        # Householder vector from column k, rows k+1..n-1
        col_re = jnp.where(idx > k, A_re[:, k], 0.0)
        col_im = jnp.where(idx > k, A_im[:, k], 0.0)
        norm = jnp.sqrt(jnp.sum(col_re**2 + col_im**2))
        # phase of the pivot x_{k+1}
        p_re = A_re[k + 1, k]
        p_im = A_im[k + 1, k]
        p_abs = jnp.sqrt(p_re**2 + p_im**2)
        ph_re = jnp.where(p_abs > _EPS, p_re / p_abs, 1.0)
        ph_im = jnp.where(p_abs > _EPS, p_im / p_abs, 0.0)
        # v = x + phase·||x||·e_{k+1}
        e = (idx == k + 1).astype(A_re.dtype)
        v_re = col_re + ph_re * norm * e
        v_im = col_im + ph_im * norm * e
        vnorm2 = jnp.sum(v_re**2 + v_im**2)
        skip = vnorm2 < _EPS
        inv = jnp.where(skip, 0.0, 2.0 / jnp.maximum(vnorm2, _EPS))

        # A ← A − inv · v (v* A)
        w_re = v_re @ A_re + v_im @ A_im   # (v* A).re
        w_im = v_re @ A_im - v_im @ A_re   # (v* A).im
        A_re = A_re - inv * (v_re[:, None] * w_re[None, :] - v_im[:, None] * w_im[None, :])
        A_im = A_im - inv * (v_re[:, None] * w_im[None, :] + v_im[:, None] * w_re[None, :])
        # A ← A − inv · (A v) v*
        u_re = A_re @ v_re - A_im @ v_im
        u_im = A_re @ v_im + A_im @ v_re
        A_re = A_re - inv * (u_re[:, None] * v_re[None, :] + u_im[:, None] * v_im[None, :])
        A_im = A_im - inv * (u_im[:, None] * v_re[None, :] - u_re[:, None] * v_im[None, :])
        return (A_re, A_im)

    if n <= 2:
        return a
    return lax.fori_loop(0, n - 2, body, a)


def _wilkinson_shift(A: Pair, q):
    """Eigenvalue of the trailing (q−2, q−1) 2×2 block closest to its
    bottom-right entry."""
    A_re, A_im = A
    a_re = A_re[q - 2, q - 2]; a_im = A_im[q - 2, q - 2]
    b_re = A_re[q - 2, q - 1]; b_im = A_im[q - 2, q - 1]
    c_re = A_re[q - 1, q - 2]; c_im = A_im[q - 1, q - 2]
    d_re = A_re[q - 1, q - 1]; d_im = A_im[q - 1, q - 1]
    tr2_re, tr2_im = (a_re + d_re) / 2, (a_im + d_im) / 2
    dif_re, dif_im = (a_re - d_re) / 2, (a_im - d_im) / 2
    disc_re, disc_im = _cmul(dif_re, dif_im, dif_re, dif_im)
    bc_re, bc_im = _cmul(b_re, b_im, c_re, c_im)
    s_re, s_im = _csqrt(disc_re + bc_re, disc_im + bc_im)
    mu1_re, mu1_im = tr2_re + s_re, tr2_im + s_im
    mu2_re, mu2_im = tr2_re - s_re, tr2_im - s_im
    d1 = (mu1_re - d_re) ** 2 + (mu1_im - d_im) ** 2
    d2 = (mu2_re - d_re) ** 2 + (mu2_im - d_im) ** 2
    pick2 = d2 < d1
    return jnp.where(pick2, mu2_re, mu1_re), jnp.where(pick2, mu2_im, mu1_im)


def _qr_step(A: Pair, q, mu: Tuple[jax.Array, jax.Array]) -> Pair:
    """One shifted QR sweep on the leading q×q block (Givens rotations;
    rotations outside the active block are identities)."""
    A_re, A_im = A
    n = A_re.shape[-1]
    mu_re, mu_im = mu
    eye = jnp.eye(n, dtype=A_re.dtype)
    A_re = A_re - mu_re * eye
    A_im = A_im - mu_im * eye

    def left_body(i, carry):
        A_re, A_im, cs_c, cs_sr, cs_si = carry
        active = i < q - 1
        a_re, a_im = A_re[i, i], A_im[i, i]
        b_re, b_im = A_re[i + 1, i], A_im[i + 1, i]
        r = jnp.sqrt(a_re**2 + a_im**2 + b_re**2 + b_im**2)
        safe = r > _EPS
        c = jnp.where(safe & active, jnp.sqrt(a_re**2 + a_im**2) / jnp.maximum(r, _EPS), 1.0)
        # s = (a/|a|)·conj(b)/r ; when |a|≈0 use phase 1
        a_abs = jnp.sqrt(a_re**2 + a_im**2)
        ph_re = jnp.where(a_abs > _EPS, a_re / jnp.maximum(a_abs, _EPS), 1.0)
        ph_im = jnp.where(a_abs > _EPS, a_im / jnp.maximum(a_abs, _EPS), 0.0)
        s_re, s_im = _cmul(ph_re, ph_im, b_re, -b_im)
        s_re = jnp.where(safe & active, s_re / jnp.maximum(r, _EPS), 0.0)
        s_im = jnp.where(safe & active, s_im / jnp.maximum(r, _EPS), 0.0)

        # rows i, i+1 ← [[c, s], [−conj(s), c]] · rows
        r0_re, r0_im = A_re[i], A_im[i]
        r1_re, r1_im = A_re[i + 1], A_im[i + 1]
        sr1_re, sr1_im = _cmul(s_re, s_im, r1_re, r1_im)
        new0_re = c * r0_re + sr1_re
        new0_im = c * r0_im + sr1_im
        sr0_re, sr0_im = _cmul(s_re, -s_im, r0_re, r0_im)
        new1_re = c * r1_re - sr0_re
        new1_im = c * r1_im - sr0_im
        A_re = A_re.at[i].set(new0_re).at[i + 1].set(new1_re)
        A_im = A_im.at[i].set(new0_im).at[i + 1].set(new1_im)
        cs_c = cs_c.at[i].set(c)
        cs_sr = cs_sr.at[i].set(s_re)
        cs_si = cs_si.at[i].set(s_im)
        return A_re, A_im, cs_c, cs_sr, cs_si

    cs_c = jnp.ones(n - 1, A_re.dtype)
    cs_sr = jnp.zeros(n - 1, A_re.dtype)
    cs_si = jnp.zeros(n - 1, A_re.dtype)
    A_re, A_im, cs_c, cs_sr, cs_si = lax.fori_loop(
        0, n - 1, left_body, (A_re, A_im, cs_c, cs_sr, cs_si)
    )

    def right_body(i, carry):
        A_re, A_im = carry
        c = cs_c[i]
        s_re, s_im = cs_sr[i], cs_si[i]
        # cols i, i+1 ← cols · [[c, −s], [conj(s), c]]  (G† from the right)
        c0_re, c0_im = A_re[:, i], A_im[:, i]
        c1_re, c1_im = A_re[:, i + 1], A_im[:, i + 1]
        sc1_re, sc1_im = _cmul(s_re, -s_im, c1_re, c1_im)
        new0_re = c * c0_re + sc1_re
        new0_im = c * c0_im + sc1_im
        sc0_re, sc0_im = _cmul(s_re, s_im, c0_re, c0_im)
        new1_re = c * c1_re - sc0_re
        new1_im = c * c1_im - sc0_im
        A_re = A_re.at[:, i].set(new0_re).at[:, i + 1].set(new1_re)
        A_im = A_im.at[:, i].set(new0_im).at[:, i + 1].set(new1_im)
        return A_re, A_im

    A_re, A_im = lax.fori_loop(0, n - 1, right_body, (A_re, A_im))
    A_re = A_re + mu_re * eye
    A_im = A_im + mu_im * eye
    return (A_re, A_im)


@functools.partial(jax.jit, static_argnames=("max_sweeps_per_eig",))
def eigvals_pair_device(m: Pair, max_sweeps_per_eig: int = 15) -> Pair:
    """Eigenvalues of one complex (N, N) pair matrix, fully on device.

    vmap over leading dims for batching.  Returns (re, im) of the N
    (unordered) eigenvalues.
    """
    A = _hessenberg((m[0].astype(jnp.float32), m[1].astype(jnp.float32)))
    n = A[0].shape[-1]
    if n == 1:
        return (A[0][..., 0, 0][None], A[1][..., 0, 0][None])

    max_iters = max_sweeps_per_eig * n
    tol = 1e-6

    def cond(carry):
        _, q, it, _ = carry
        return (q > 1) & (it < max_iters)

    def step(carry):
        A, q, it, stall = carry
        mu = _wilkinson_shift(A, q)
        # exceptional shift every 8 stalled sweeps — near-unitary spectra
        # (exactly the S4 Ā case) cycle under pure Wilkinson shifts
        sub = jnp.sqrt(A[0][q - 1, q - 2] ** 2 + A[1][q - 1, q - 2] ** 2)
        exc_re = A[0][q - 1, q - 1] + 1.5 * sub
        exc_im = A[1][q - 1, q - 1] + 0.5 * sub * (
            (stall % 3).astype(A[1].dtype) - 1.0
        )
        use_exc = (stall > 0) & (stall % 8 == 0)
        mu = (
            jnp.where(use_exc, exc_re, mu[0]),
            jnp.where(use_exc, exc_im, mu[1]),
        )
        A = _qr_step(A, q, mu)
        # deflate while the trailing subdiagonal of the active block is tiny
        A_re, A_im = A

        def deflate_cond(c):
            A_re, A_im, q = c
            sub = jnp.sqrt(A_re[q - 1, q - 2] ** 2 + A_im[q - 1, q - 2] ** 2)
            diag = (
                jnp.abs(A_re[q - 2, q - 2]) + jnp.abs(A_im[q - 2, q - 2])
                + jnp.abs(A_re[q - 1, q - 1]) + jnp.abs(A_im[q - 1, q - 1])
            )
            return (q > 1) & (sub <= tol * jnp.maximum(diag, 1.0))

        def deflate_body(c):
            A_re, A_im, q = c
            A_re = A_re.at[q - 1, q - 2].set(0.0)
            A_im = A_im.at[q - 1, q - 2].set(0.0)
            return A_re, A_im, q - 1

        q_new = q
        A_re, A_im, q_new = lax.while_loop(
            deflate_cond, deflate_body, (A_re, A_im, q_new)
        )
        stall = jnp.where(q_new < q, 0, stall + 1)
        return (A_re, A_im), q_new, it + 1, stall

    (A, _, _, _) = lax.while_loop(
        cond, step,
        (A, jnp.asarray(n, jnp.int32), jnp.asarray(0, jnp.int32),
         jnp.asarray(0, jnp.int32)),
    )
    return (jnp.diagonal(A[0]), jnp.diagonal(A[1]))
