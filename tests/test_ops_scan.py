"""Diagonal linear-recurrence scan: impl equivalence + gradients.

Oracle is the sequential ``lax.scan`` path — the reference repo itself
carries both a sequential and a parallel formulation of the same recurrence
(ref models/s4.py:82-88 vs :50-79), making their equivalence the natural
invariant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.ops.scan import diag_linear_scan
from tlie_tpu.utils import cplx

from jax.experimental.pallas import tpu as pltpu


def _rand_pair(key, shape, decay=False):
    k1, k2 = jax.random.split(key)
    re = jax.random.normal(k1, shape)
    im = jax.random.normal(k2, shape)
    if decay:
        r = jnp.exp(-jnp.abs(re) * 0.2)
        return (r * jnp.cos(im * 0.3), r * jnp.sin(im * 0.3))
    return (re, im)


@pytest.mark.parametrize("reverse", [False, True])
def test_assoc_matches_sequential_complex(reverse):
    key = jax.random.PRNGKey(0)
    a = _rand_pair(key, (3, 64, 8), decay=True)
    b = _rand_pair(jax.random.fold_in(key, 1), (3, 64, 8))
    h1 = diag_linear_scan(a, b, impl="scan", reverse=reverse)
    h2 = diag_linear_scan(a, b, impl="assoc", reverse=reverse)
    np.testing.assert_allclose(h1[0], h2[0], atol=1e-5)
    np.testing.assert_allclose(h1[1], h2[1], atol=1e-5)


def test_assoc_matches_sequential_real():
    key = jax.random.PRNGKey(2)
    a = jnp.exp(-jnp.abs(jax.random.normal(key, (2, 33, 5))))
    b = jax.random.normal(jax.random.fold_in(key, 1), (2, 33, 5))
    h1 = diag_linear_scan(a, b, impl="scan")
    h2 = diag_linear_scan(a, b, impl="assoc")
    np.testing.assert_allclose(h1, h2, atol=1e-5)


def test_matches_numpy_complex_reference():
    """Cross-check against a pure-numpy complex recurrence."""
    rng = np.random.RandomState(0)
    L, N = 40, 4
    a = (0.9 * np.exp(1j * rng.uniform(-1, 1, (L, N)))).astype(np.complex64)
    b = (rng.randn(L, N) + 1j * rng.randn(L, N)).astype(np.complex64)
    h_ref = np.zeros((L, N), np.complex64)
    h = np.zeros(N, np.complex64)
    for t in range(L):
        h = a[t] * h + b[t]
        h_ref[t] = h
    out = diag_linear_scan(
        (jnp.asarray(a.real), jnp.asarray(a.imag)),
        (jnp.asarray(b.real), jnp.asarray(b.imag)),
        impl="assoc",
    )
    np.testing.assert_allclose(cplx.to_complex(out), h_ref, atol=1e-4)


def test_broadcast_decay_over_batch():
    """LRU pattern: shared (L, N) decay against per-example (B, L, N) input."""
    key = jax.random.PRNGKey(3)
    a = _rand_pair(key, (16, 8), decay=True)
    b = _rand_pair(jax.random.fold_in(key, 1), (4, 16, 8))
    h1 = diag_linear_scan(a, b, impl="scan")
    h2 = diag_linear_scan(a, b, impl="assoc")
    np.testing.assert_allclose(h1[0], h2[0], atol=1e-5)


@pytest.mark.parametrize("reverse", [False, True])
def test_pallas_interpret_matches(reverse):
    """Pallas kernel (interpreter mode on CPU) vs the sequential oracle."""
    key = jax.random.PRNGKey(4)
    a = _rand_pair(key, (2, 128, 128), decay=True)
    b = _rand_pair(jax.random.fold_in(key, 1), (2, 128, 128))
    h1 = diag_linear_scan(a, b, impl="scan", reverse=reverse)
    with pltpu.force_tpu_interpret_mode():
        h2 = diag_linear_scan(a, b, impl="pallas", reverse=reverse)
    np.testing.assert_allclose(h1[0], h2[0], atol=1e-4)
    np.testing.assert_allclose(h1[1], h2[1], atol=1e-4)


def test_pallas_gradients_match_assoc():
    key = jax.random.PRNGKey(5)
    a = _rand_pair(key, (1, 128, 128), decay=True)
    b = _rand_pair(jax.random.fold_in(key, 1), (1, 128, 128))

    def loss(impl):
        def f(ar, ai, br, bi):
            hr, hi = diag_linear_scan((ar, ai), (br, bi), impl=impl)
            return jnp.sum(hr**2 + hi**2)

        return jax.grad(f, argnums=(0, 1, 2, 3))

    g_ref = loss("assoc")(*a, *b)
    with pltpu.force_tpu_interpret_mode():
        g_pal = loss("pallas")(*a, *b)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(gr, gp, rtol=2e-3, atol=1e-3)
