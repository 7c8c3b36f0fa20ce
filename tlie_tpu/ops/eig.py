"""Eigendecomposition for the analysis engine.

The S4 spectra need eigenvalues of a dense complex matrix Ā
(ref analysis/eval_eig.py:296, host ``np.linalg.eigvals``).  The TPU backend
has no complex dtype and no nonsymmetric eig, so two paths:

  * ``eigvals_pair(impl="host")`` — default: an explicit host hop
    (device_get → numpy LAPACK eigvals → device).  Note it is NOT a
    ``jax.pure_callback`` — the axon TPU runtime does not support callbacks
    at all — so it must run outside jit, which the analysis pipeline does.
    State dims here are 64–512, so the transfer is tiny; this mirrors the
    reference's own host hop and gives bit-parity.
  * ``eigvals_pair(impl="device")`` — native on-device Hessenberg +
    shifted-QR in (re, im) pair arithmetic (``ops/eig_device.py``), the
    SURVEY.md §2.2 K8 north star; tested in tests/test_eig_device.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import cplx


def _host_eigvals(re: np.ndarray, im: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    w = np.linalg.eigvals(re + 1j * im)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def eigvals_pair(m: cplx.Pair, impl: str = "host") -> Tuple[jax.Array, jax.Array]:
    """Eigenvalues of a complex matrix given as an (re, im) pair of (..., N, N)
    real arrays; returns an (re, im) pair of (..., N) arrays (unordered).

    impl="host": explicit host hop (device_get → LAPACK → device) — the axon
    TPU runtime does not support ``jax.pure_callback`` at all, so this path
    must be called outside jit, which the analysis pipeline does (one tiny
    matrix per layer, exactly the reference's own host eig at
    eval_eig.py:296).  Bit-parity with the reference.

    impl="device": native on-device Hessenberg+shifted-QR (see
    ``eig_device.py``) — jit/vmap-able, batches many layers/checkpoints.
    Note the S4 Ā spectra are intrinsically ill-conditioned (eigenvector
    condition ~1e15), so individual eigenvalues can differ from LAPACK by
    more than fp tolerance while the radius/phase histograms the analysis
    consumes agree exactly (verified in tests).
    """
    if impl == "device":
        from .eig_device import eigvals_pair_device

        fn = eigvals_pair_device
        for _ in range(m[0].ndim - 2):
            fn = jax.vmap(fn)
        return fn(m)
    re = np.asarray(jax.device_get(m[0]))
    im = np.asarray(jax.device_get(m[1]))
    w_re, w_im = _host_eigvals(re, im)
    return jnp.asarray(w_re), jnp.asarray(w_im)
