"""Eigendecomposition for the analysis engine.

The S4 spectra need eigenvalues of a dense complex matrix Ā
(ref analysis/eval_eig.py:296, host ``np.linalg.eigvals``).  The TPU backend
has no complex dtype and no nonsymmetric eig, so two paths:

  * ``eigvals_pair`` — default: ``jax.pure_callback`` to numpy's LAPACK
    eigvals on host.  State dims here are 64–512, so the transfer is tiny;
    this mirrors the reference's own host hop.
  * A native on-device Hessenberg+shifted-QR path is planned (SURVEY.md
    §2.2 K8 north star) and will slot in behind the same API.
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


def eigvals_pair(m: cplx.Pair) -> Tuple[jax.Array, jax.Array]:
    """Eigenvalues of a complex matrix given as an (re, im) pair of (..., N, N)
    real arrays; returns an (re, im) pair of (..., N) arrays (unordered)."""
    re, im = m
    n = re.shape[-1]
    out_shape = (
        jax.ShapeDtypeStruct(re.shape[:-1], jnp.float32),
        jax.ShapeDtypeStruct(re.shape[:-1], jnp.float32),
    )
    return jax.pure_callback(_host_eigvals, out_shape, re, im, vmap_method="sequential")
