"""Complex arithmetic as (real, imag) pairs of real arrays.

The TPU backend exposes no complex dtype anywhere (not even elementwise
complex multiply or FFT — verified empirically on the target chip), so every
complex quantity in this framework — LRU/S5/S4 eigenvalues, scans,
discretizations, Cauchy kernels, FFTs — is carried as a pair of real arrays.
This module is the single place that knows the arithmetic.

A pair is just a ``(re, im)`` tuple of equal-shape arrays; functions also
accept plain real arrays (treated as imag=0) and numpy/jnp complex arrays
(split on entry) so CPU-side oracles can interoperate.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Pair = Tuple[jax.Array, jax.Array]


def pair(z) -> Pair:
    """Coerce to a (re, im) pair."""
    if isinstance(z, tuple) and len(z) == 2:
        return z
    z = jnp.asarray(z)
    if jnp.iscomplexobj(z):
        return (jnp.real(z), jnp.imag(z))
    return (z, jnp.zeros_like(z))


def to_complex(z: Pair):
    """Materialise as a complex array (CPU/test use only)."""
    re, im = pair(z)
    return re + 1j * im


def add(x, y) -> Pair:
    (a, b), (c, d) = pair(x), pair(y)
    return (a + c, b + d)


def sub(x, y) -> Pair:
    (a, b), (c, d) = pair(x), pair(y)
    return (a - c, b - d)


def mul(x, y) -> Pair:
    (a, b), (c, d) = pair(x), pair(y)
    return (a * c - b * d, a * d + b * c)


def scale(x, s) -> Pair:
    (a, b) = pair(x)
    return (a * s, b * s)


def div(x, y) -> Pair:
    (a, b), (c, d) = pair(x), pair(y)
    denom = c * c + d * d
    return ((a * c + b * d) / denom, (b * c - a * d) / denom)


def reciprocal(y) -> Pair:
    (c, d) = pair(y)
    denom = c * c + d * d
    return (c / denom, -d / denom)


def conj(x) -> Pair:
    (a, b) = pair(x)
    return (a, -b)


def neg(x) -> Pair:
    (a, b) = pair(x)
    return (-a, -b)


def abs2(x) -> jax.Array:
    (a, b) = pair(x)
    return a * a + b * b


def absval(x) -> jax.Array:
    return jnp.sqrt(abs2(x))


def angle(x) -> jax.Array:
    (a, b) = pair(x)
    return jnp.arctan2(b, a)


def exp(x) -> Pair:
    """exp(a + ib) = e^a (cos b + i sin b)."""
    (a, b) = pair(x)
    ea = jnp.exp(a)
    return (ea * jnp.cos(b), ea * jnp.sin(b))


def expi(theta) -> Pair:
    """exp(i·theta) for real theta."""
    theta = jnp.asarray(theta)
    return (jnp.cos(theta), jnp.sin(theta))


def matmul(x, y) -> Pair:
    """Complex matmul from four real matmuls (3-mult Karatsuba is not worth
    the extra adds on the MXU)."""
    (a, b), (c, d) = pair(x), pair(y)
    return (a @ c - b @ d, a @ d + b @ c)


def einsum(subscripts: str, x, y) -> Pair:
    (a, b), (c, d) = pair(x), pair(y)
    rr = jnp.einsum(subscripts, a, c)
    ii = jnp.einsum(subscripts, b, d)
    ri = jnp.einsum(subscripts, a, d)
    ir = jnp.einsum(subscripts, b, c)
    return (rr - ii, ri + ir)


def stack_real(z: Pair, axis: int = -1) -> jax.Array:
    """Pack a pair into one real array with a trailing re/im axis (the
    parameter-storage convention shared with the reference checkpoints)."""
    re, im = pair(z)
    return jnp.stack([re, im], axis=axis)


def unstack_real(arr: jax.Array, axis: int = -1) -> Pair:
    re = jnp.take(arr, 0, axis=axis)
    im = jnp.take(arr, 1, axis=axis)
    return (re, im)
