"""FFT causal convolution + Cauchy kernel reduction (S4's CNN mode).

TPU-native counterparts of the reference's generating-function path
(ref models/s4.py:43-79): the SSM convolution kernel is evaluated at the
roots of unity through a Cauchy-matrix reduction and applied with an rFFT
causal convolution.  Both map directly onto XLA's TPU FFT and batched
vector ops; computation is fp32/complex64.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cauchy_dot(v: jax.Array, omega: jax.Array, lam: jax.Array) -> jax.Array:
    """sum_n v_n / (omega_l - lam_n) for every omega_l: (N,), (L,), (N,) → (L,).

    Vectorised as one (L, N) broadcast-reduce instead of a vmapped scalar
    loop — N·L is at most a few M complex elements for this workload.
    """
    return (v[None, :] / (omega[:, None] - lam[None, :])).sum(axis=-1)


def causal_fft_conv(u: jax.Array, K: jax.Array) -> jax.Array:
    """Causal convolution of signal ``u`` with kernel ``K`` along the last
    axis via zero-padded rFFT (both length L; output length L)."""
    L = u.shape[-1]
    n = 2 * L
    ud = jnp.fft.rfft(u, n=n)
    Kd = jnp.fft.rfft(K, n=n)
    return jnp.fft.irfft(ud * Kd, n=n)[..., :L]
