"""Matmul-based FFT on (re, im) pairs — the TPU has no native FFT.

``jnp.fft.*`` is UNIMPLEMENTED on the target TPU backend (verified
empirically), and there is no complex dtype either.  S4's convolution mode
needs an FFT (ref models/s4.py:67-79), so this module implements the
Cooley-Tukey *four-step* factorisation as dense DFT matmuls on real planes:

    N = N1·N2:  reshape → DFT_N1 (matmul) → twiddle (elementwise)
                → DFT_N2 (matmul) → transpose-gather

Small DFT factors (≤ 256) are dense matrices living on the MXU; larger
lengths recurse.  For the power-of-two lengths this framework uses
(512…8192) that is one or two levels of recursion and the whole transform is
a handful of batched matmuls — the idiomatic TPU FFT.

All inputs/outputs are (re, im) pairs of real arrays; the transform axis is
the last one.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import cplx

_MAX_DENSE = 256


@functools.lru_cache(maxsize=None)
def _dft_matrices(n: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Dense (n, n) DFT matrix as (re, im) numpy planes."""
    k = np.arange(n)
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(k, k) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddles(n1: int, n2: int, inverse: bool) -> Tuple[np.ndarray, np.ndarray]:
    """(n1, n2) twiddle factors W_N^{±k1·n2}, N = n1·n2."""
    n = n1 * n2
    sign = 2.0 if inverse else -2.0
    ang = sign * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split_length(n: int) -> Tuple[int, int]:
    """Pick n1·n2 = n with n1 ≤ _MAX_DENSE, preferring balanced factors."""
    best = None
    f = 2
    m = n
    factors = []
    while f * f <= m:
        while m % f == 0:
            factors.append(f)
            m //= f
        f += 1
    if m > 1:
        factors.append(m)
    # greedy: build n1 up to the sqrt without exceeding _MAX_DENSE
    n1 = 1
    target = int(np.sqrt(n))
    for p in sorted(factors, reverse=True):
        if n1 * p <= min(_MAX_DENSE, max(target, p)):
            n1 *= p
    if n1 == 1 or n1 == n:
        # fall back: smallest prime factor
        n1 = factors[0]
    return n1, n // n1


def _dense_dft(x: cplx.Pair, n: int, inverse: bool) -> cplx.Pair:
    m_re, m_im = _dft_matrices(n, inverse)
    xr, xi = x
    # Contract last axis of x with first axis of the DFT matrix.  Full fp32
    # accumulation: the default bf16 MXU precision loses ~1e-3 relative on a
    # DFT, which is too coarse for the S4 kernel math built on top.
    dot = functools.partial(
        jnp.matmul, precision=jax.lax.Precision.HIGHEST
    )
    rr = dot(xr, m_re)
    ii = dot(xi, m_im)
    ri = dot(xr, m_im)
    ir = dot(xi, m_re)
    return (rr - ii, ri + ir)


def _fft_pair(x: cplx.Pair, inverse: bool) -> cplx.Pair:
    n = x[0].shape[-1]
    if n <= _MAX_DENSE:
        return _dense_dft(x, n, inverse)
    n1, n2 = _split_length(n)
    lead = x[0].shape[:-1]
    # decimation in time: column n2-major layout x[n1, n2] = x[n2 + n2max*n1]?
    # Use the standard mapping n = n1_idx * n2 + n2_idx (row-major reshape):
    #   X[k2 * n1 + k1] = Σ_{n2_idx} W_N^{k1 n2_idx} W_{n2}^{k2 n2_idx}
    #                     · Σ_{n1_idx} x[n1_idx, n2_idx] W_{n1}^{k1 n1_idx}
    xr = x[0].reshape(lead + (n1, n2))
    xi = x[1].reshape(lead + (n1, n2))
    # DFT over the n1 axis (axis -2): move it last, transform, move back
    y = _fft_pair((jnp.swapaxes(xr, -1, -2), jnp.swapaxes(xi, -1, -2)), inverse)
    # y is (..., n2, n1) indexed [n2_idx, k1]; apply twiddle W_N^{k1 n2_idx}
    t_re, t_im = _twiddles(n1, n2, inverse)
    tw = (jnp.asarray(t_re).T, jnp.asarray(t_im).T)  # (n2, n1)
    y = cplx.mul(y, tw)
    # DFT over the n2 axis: move n2 last → (..., n1, n2) indexed [k1, n2_idx]
    y = (jnp.swapaxes(y[0], -1, -2), jnp.swapaxes(y[1], -1, -2))
    y = _fft_pair(y, inverse)
    # y[..., k1, k2]; output index k = k2 * n1 + k1 → transpose then flatten
    out_r = jnp.swapaxes(y[0], -1, -2).reshape(lead + (n,))
    out_i = jnp.swapaxes(y[1], -1, -2).reshape(lead + (n,))
    return (out_r, out_i)


def fft(x, n: int | None = None) -> cplx.Pair:
    """Forward DFT along the last axis. ``x`` is a pair or a real array;
    optional zero-padding/truncation to length ``n``."""
    xr, xi = cplx.pair(x)
    if n is not None:
        cur = xr.shape[-1]
        if cur < n:
            pad = [(0, 0)] * (xr.ndim - 1) + [(0, n - cur)]
            xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
        elif cur > n:
            xr, xi = xr[..., :n], xi[..., :n]
    return _fft_pair((xr, xi), inverse=False)


def ifft(x, n: int | None = None) -> cplx.Pair:
    """Inverse DFT (1/N normalised) along the last axis."""
    xr, xi = cplx.pair(x)
    if n is not None:
        cur = xr.shape[-1]
        if cur < n:
            pad = [(0, 0)] * (xr.ndim - 1) + [(0, n - cur)]
            xr, xi = jnp.pad(xr, pad), jnp.pad(xi, pad)
        elif cur > n:
            xr, xi = xr[..., :n], xi[..., :n]
    m = xr.shape[-1]
    yr, yi = _fft_pair((xr, xi), inverse=True)
    return (yr / m, yi / m)
