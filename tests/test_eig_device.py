"""On-device Hessenberg+QR eigensolver vs LAPACK (K8 north star)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.ops.eig import eigvals_pair
from tlie_tpu.ops.eig_device import _hessenberg, eigvals_pair_device
from tlie_tpu.models.initializers import make_dplr_hippo


def _rand_complex(rng, n):
    return ((rng.randn(n, n) + 1j * rng.randn(n, n)) / np.sqrt(n)).astype(np.complex64)


@pytest.mark.parametrize("n", [2, 5, 16, 48])
def test_device_eig_matches_lapack(n):
    rng = np.random.RandomState(n)
    a = _rand_complex(rng, n)
    re, im = eigvals_pair_device((jnp.asarray(a.real), jnp.asarray(a.imag)))
    w = np.sort_complex(np.asarray(re) + 1j * np.asarray(im))
    w_ref = np.sort_complex(np.linalg.eigvals(a))
    np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-4)


def test_hessenberg_preserves_spectrum():
    rng = np.random.RandomState(0)
    a = _rand_complex(rng, 24)
    h_re, h_im = _hessenberg((jnp.asarray(a.real), jnp.asarray(a.imag)))
    h = np.asarray(h_re) + 1j * np.asarray(h_im)
    assert np.abs(np.tril(h, -2)).max() < 1e-5
    np.testing.assert_allclose(
        np.sort_complex(np.linalg.eigvals(h)),
        np.sort_complex(np.linalg.eigvals(a)),
        rtol=1e-4, atol=1e-4,
    )


def test_batched_via_eigvals_pair():
    rng = np.random.RandomState(1)
    batch = np.stack([_rand_complex(rng, 12) for _ in range(4)])
    re, im = eigvals_pair((jnp.asarray(batch.real), jnp.asarray(batch.imag)),
                          impl="device")
    for i in range(4):
        w = np.sort_complex(np.asarray(re)[i] + 1j * np.asarray(im)[i])
        w_ref = np.sort_complex(np.linalg.eigvals(batch[i]))
        np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-4)


def test_s4_abar_binned_stats_match_lapack():
    """The S4 Ā spectrum has eigenvector condition ~1e15, so individual
    eigenvalues are not comparable beyond the problem's own conditioning —
    but the radius histograms the analysis consumes must agree exactly."""
    from tlie_tpu.analysis.binning import RADIUS_THRESHOLDS, threshold_analysis_ssm

    lam, p, _, _, _ = make_dplr_hippo(32)
    lam = np.clip(lam.real, None, -1e-4) + 1j * lam.imag
    step = 0.05
    I = np.eye(32)
    A = np.diag(lam) - np.outer(p, p.conj())
    A0 = (2 / step) * I + A
    D = np.diag(1.0 / ((2 / step) - lam))
    qc = p.conj().reshape(1, -1)
    p2 = p.reshape(-1, 1)
    A1 = D - (D @ p2 * (1.0 / (1 + (qc @ D @ p2))) * qc @ D)
    Ab = (A1 @ A0).astype(np.complex64)

    re, im = eigvals_pair_device((jnp.asarray(Ab.real), jnp.asarray(Ab.imag)),
                                 max_sweeps_per_eig=30)
    r_dev = np.sort(np.abs(np.asarray(re) + 1j * np.asarray(im)))
    r_ref = np.sort(np.abs(np.linalg.eigvals(Ab)))
    pct_dev = threshold_analysis_ssm(r_dev[:, None], RADIUS_THRESHOLDS)
    pct_ref = threshold_analysis_ssm(r_ref[:, None], RADIUS_THRESHOLDS)
    np.testing.assert_allclose(pct_dev, pct_ref, atol=3.2)  # ≤1 of 32 eigs may swap bins
