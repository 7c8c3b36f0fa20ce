"""SSM initialisation math: HiPPO matrices, timescales, projected B/C inits.

Functional parity with the reference init path (ref models/common.py:178-341)
so that spectra computed from freshly initialised models follow the same
distributions.  The HiPPO construction (eigendecomposition of the normalised
LegS generator) runs once on the host in numpy — it is setup-time constant
folding, and the TPU backend has no complex linear algebra anyway.  Anything
executed inside ``flax`` param initialisers (and therefore traced on device)
is real-valued jax code operating on (re, im) planes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# HiPPO (host-side numpy, init-time constants)
# --------------------------------------------------------------------------


def make_hippo(n: int) -> np.ndarray:
    """Negated HiPPO-LegS matrix (ref models/common.py:180-191).

    float32 throughout: the reference computes this in jax's default f32,
    and the downstream eigendecomposition's eigenvector phases depend on the
    exact input bits — f32 parity here makes its checkpoints bit-compatible.
    """
    p = np.sqrt(1 + 2 * np.arange(n, dtype=np.float32))
    a = np.tril(np.outer(p, p)) - np.diag(np.arange(n, dtype=np.float32))
    return -a


def make_nplr_hippo(n: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """HiPPO plus the rank-1 term P and input vector B making it normal
    (ref models/common.py:193-212)."""
    hippo = make_hippo(n)
    p = np.sqrt(np.arange(n, dtype=np.float32) + 0.5)
    b = np.sqrt(2 * np.arange(n, dtype=np.float32) + 1.0)
    return hippo, p, b


def make_dplr_hippo(n: int):
    """Diagonal-plus-low-rank decomposition of HiPPO-LegS.

    Returns (Lambda complex, P complex, B complex, V complex, B_orig real) —
    same contract as the reference (ref models/common.py:215-241).
    """
    a, p, b = make_nplr_hippo(n)
    s = a + np.outer(p, p)
    s_diag = np.diagonal(s)
    lambda_real = np.mean(s_diag) * np.ones_like(s_diag)
    # S is skew-symmetric (plus diagonal), so -i·S is Hermitian.  Use jax's
    # eigh on the host CPU backend: LAPACK drivers differ between numpy and
    # jax in eigenvector PHASE conventions, and matching the reference's
    # (jax) choice makes P/B initial values — and therefore its checkpoints —
    # bit-compatible, not just equivalent up to basis.
    # complex64, matching the reference's float32 jax pipeline — eigenvector
    # phases depend on dtype and driver, and checkpoint-level compatibility
    # needs the same choices
    lambda_imag, v = _host_eigh((s * -1j).astype(np.complex64))
    p_out = v.conj().T @ p
    b_out = v.conj().T @ b
    return lambda_real + 1j * lambda_imag, p_out, b_out, v, b


def _host_eigh(m: np.ndarray):
    try:
        import jax
        import jax.numpy as jnp

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            w, v = jnp.linalg.eigh(jnp.asarray(m))
        return np.asarray(w), np.asarray(v)
    except Exception:
        return np.linalg.eigh(m)


# --------------------------------------------------------------------------
# Timescale (log_step) initialisers (ref models/common.py:244-284)
# --------------------------------------------------------------------------


def log_step_initializer(dt_min: float = 0.001, dt_max: float = 0.1):
    """Uniform in log-space between dt_min and dt_max."""

    def init(key, shape):
        u = jax.random.uniform(key, shape)
        return u * (jnp.log(dt_max) - jnp.log(dt_min)) + jnp.log(dt_min)

    return init


def init_log_steps(key, input_tuple):
    """(H, dt_min, dt_max) → (H, 1) log-timescales, one key-split per row
    (kept to match the reference's per-row splitting so identical seeds give
    identical values, ref models/common.py:268-284)."""
    h, dt_min, dt_max = input_tuple
    rows = []
    for _ in range(h):
        key, skey = jax.random.split(key)
        rows.append(log_step_initializer(dt_min, dt_max)(skey, (1,)))
    return jnp.array(rows)


# --------------------------------------------------------------------------
# Projected B / C initialisers storing complex as a trailing re/im axis
# (checkpoint layout shared with the reference, ref models/common.py:287-341)
# --------------------------------------------------------------------------


def init_vinv_b(init_fun, rng, shape, vinv_re: np.ndarray, vinv_im: np.ndarray):
    """B_tilde = V⁻¹ B with real-sampled B; returns (P, H, 2)."""
    b = init_fun(rng, shape)
    re = jnp.asarray(vinv_re) @ b
    im = jnp.asarray(vinv_im) @ b
    return jnp.concatenate([re[..., None], im[..., None]], axis=-1)


def trunc_standard_normal(key, shape):
    """(H, P, 2) lecun-normal rows, one key-split per row
    (ref models/common.py:306-320)."""
    h, p, _ = shape
    rows = []
    for _ in range(h):
        key, skey = jax.random.split(key)
        rows.append(jax.nn.initializers.lecun_normal()(skey, (1, p, 2)))
    return jnp.array(rows)[:, 0]


def init_cv(init_fun, rng, shape, v_re: np.ndarray, v_im: np.ndarray):
    """C_tilde = C V with complex-sampled C; returns (H, P, 2)."""
    c = init_fun(rng, shape)
    c_re, c_im = c[..., 0], c[..., 1]
    # full complex product: (c_re + i c_im) @ (v_re + i v_im)
    cv_re = c_re @ jnp.asarray(v_re) - c_im @ jnp.asarray(v_im)
    cv_im = c_re @ jnp.asarray(v_im) + c_im @ jnp.asarray(v_re)
    return jnp.concatenate([cv_re[..., None], cv_im[..., None]], axis=-1)


# --------------------------------------------------------------------------
# LRU ring initialisers (ref models/lru.py:22-39)
# --------------------------------------------------------------------------


def matrix_init(key, shape, dtype=jnp.float32, normalization=1.0):
    return jax.random.normal(key, shape, dtype) / normalization


def nu_log_init(key, shape, r_min=0.0, r_max=1.0):
    """log(-log |λ|) with |λ| uniform on the [r_min, r_max] ring."""
    u = jax.random.uniform(key, shape)
    return jnp.log(-0.5 * jnp.log(u * (r_max**2 - r_min**2) + r_min**2))


def theta_log_init(key, shape, max_phase=6.28):
    u = jax.random.uniform(key, shape)
    return jnp.log(max_phase * u)


def gamma_log_init(key, lamb):
    """log γ with γ = sqrt(1 - |λ|²), from (nu_log, theta_log)."""
    nu, theta = lamb
    del key, theta
    lam_abs2 = jnp.exp(-2.0 * jnp.exp(nu))  # |λ|² = exp(-2 e^{ν})
    return jnp.log(jnp.sqrt(1.0 - lam_abs2))
