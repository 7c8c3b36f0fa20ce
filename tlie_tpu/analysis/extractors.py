"""Per-architecture eigenvalue extractors — jitted, batched, on-device.

The analytical core of the framework (ref analysis/eval_eig.py:43-333): for
each architecture, the eigenvalue of the effective state-transition operator
of its normalizer/state recurrence, at every (batch, time, head, layer)
point where it is input-dependent, or per (state, layer) where it is static.

TPU-first redesign relative to the reference:
  * The reference materialises the full (B, L, L, H) score tensor, moves it
    to host, and does float64 numpy (ref :57-95).  Here the same quantity is
    computed on device in fp32 with the identical max-rescaling — the ratio
    η_t = ν_t/ν_{t+1} · exp(m_t − m_{t+1}) is exactly a stabilised
    sum-exp ratio, so fp32 + rescaling loses nothing.
  * Linear attention's ν_t = Σ_{s≤t} q_t·k_s collapses to
    q_t · cumsum(k)_t — O(L·D) instead of the reference's O(L²·D) host
    matmul, bit-identical math.
  * Complex eigenvalues are returned as (re, im) pairs of real arrays
    (no complex dtype on TPU).
  * S4's dense Ā eigendecomposition runs through ``ops.eig`` (host numpy
    by default for bit parity, mirroring ref :296; the on-device
    Hessenberg+shifted-QR solver in ``ops/eig_device.py`` is selected with
    the analysis config's ``eig_impl: device``).

Score matmuls explicitly request fp32 (HIGHEST) precision: spectra must
match the reference within 1e-5 and the default bf16 MXU mode would not.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.attention_layers import norm_fn_by_name
from ..models.s4 import discrete_dplr
from ..utils import cplx

_HI = jax.lax.Precision.HIGHEST


def _project_qk(x, kernel, bias, d_qk, num_heads):
    """Recompute q, k heads from the fused Wqkv/Wvqkn projection."""
    qkv = jnp.einsum("bld,dp->blp", x, kernel, precision=_HI)
    if bias is not None:
        qkv = qkv + bias
    return qkv


def eta_softmax_from_qk(q: jax.Array, k: jax.Array) -> jax.Array:
    """η_t of the softmax-attention normalizer recurrence from projected
    q, k heads (B, L, H, D) → (B, L−1, H).

    η_t = ν_t/ν_{t+1} with ν_t = Σ_s exp(masked score[t, s]); the masked
    score is q_t·k_s for s ≤ t and 0 beyond (the reference zeroes instead of
    −inf — reproduced exactly; ref eval_eig.py:43-95 and the lm_eigvals
    notebook's get_eig_from_qkv_att_softmax).  Crucially the reference ALSO
    zeroes the subtracted row-max at masked positions (ref eval_eig.py:67-69,
    ``scores_max_r = einsum(scores_max_r, mask)``), so each masked entry
    contributes exp(0 − 0) = 1 to ν_t — i.e. ν_t carries an additive
    (L − 1 − t) term.  Computed on device in fp32 with the reference's
    max-rescaling (an exact stabilised sum-exp ratio).
    """
    L = q.shape[1]
    scores = jnp.einsum("bthd,bshd->btsh", q, k, precision=_HI)
    causal = jnp.tril(jnp.ones((L, L), dtype=bool))[None, :, :, None]
    scores = jnp.where(causal, scores, 0.0)

    m = jnp.max(scores, axis=2)  # (B, L, H) — includes the zeros, as in ref
    # masked positions: score 0 AND subtracted max 0 → exp(0) = 1 each
    shifted = jnp.where(causal, scores - m[:, :, None, :], 0.0)
    se = jnp.sum(jnp.exp(shifted), axis=2)  # (B, L, H)
    return (se[:, :-1] / se[:, 1:]) * jnp.exp(m[:, :-1] - m[:, 1:])


def eig_att_softmax(x, wqkv_kernel, wqkv_bias, d_qk: int, d_model: int, num_heads: int):
    """η_t for softmax attention recomputed from the fused Wqkv projection
    (ref eval_eig.py:43-95).  Returns (B, L−1, H) real."""
    B, L, _ = x.shape
    head_dim = d_qk // num_heads
    qkv = _project_qk(x, wqkv_kernel, wqkv_bias, d_qk, num_heads)
    q = qkv[..., :d_qk].reshape(B, L, num_heads, head_dim)
    k = qkv[..., d_qk : 2 * d_qk].reshape(B, L, num_heads, head_dim)
    return eta_softmax_from_qk(q, k)


def eig_att_linear(x, wqkv_kernel, wqkv_bias, d_qk: int, d_model: int, num_heads: int):
    """η_t for linear attention (ref eval_eig.py:97-135):
    ν_t = (elu(q_t)+1)·Σ_{s≤t}(elu(k_s)+1), η = ν_t/ν_{t+1}."""
    B, L, _ = x.shape
    head_dim = d_qk // num_heads
    qkv = _project_qk(x, wqkv_kernel, wqkv_bias, d_qk, num_heads)
    q = jax.nn.elu(qkv[..., :d_qk].reshape(B, L, num_heads, head_dim)) + 1
    k = jax.nn.elu(qkv[..., d_qk : 2 * d_qk].reshape(B, L, num_heads, head_dim)) + 1

    k_cum = jnp.cumsum(k, axis=1)
    nu = jnp.einsum("blhd,blhd->blh", q, k_cum, precision=_HI)
    nu = jnp.where(nu == 0.0, 2e-23, nu)  # ref zero-guard (eval_eig.py:127)
    return nu[:, :-1] / nu[:, 1:]


def eig_att_norm(
    x, wvqkn_kernel, wvqkn_bias, d_qk: int, d_model: int, num_heads: int,
    norm_fn: str, offset=None,
):
    """η_t for norm attention (ref eval_eig.py:137-174):
    n_t = exp(−norm_fn(n-proj (+offset))), η_t = n_{t+1}/n_t."""
    proj = jnp.einsum("bld,dp->blp", x, wvqkn_kernel, precision=_HI)
    if wvqkn_bias is not None:
        proj = proj + wvqkn_bias
    n = proj[..., d_model + 2 * d_qk :]  # (B, L, H)
    nf = norm_fn_by_name(norm_fn)
    if offset is not None:
        n = jnp.exp(-nf(n + offset))
    else:
        n = jnp.exp(-nf(n))
    n = jnp.where(n == 0.0, 2e-23, n)
    return n[:, 1:] / n[:, :-1]


def eig_mamba2(x, in_proj_kernel, in_proj_bias, dt_bias, A_log,
               d_inner: int, ngroups: int, d_state: int, nheads: int):
    """λ_t = exp(dt_t · A) for SSD (ref eval_eig.py:176-190)."""
    proj = jnp.einsum("bld,dp->blp", x, in_proj_kernel, precision=_HI)
    if in_proj_bias is not None:
        proj = proj + in_proj_bias
    dt = proj[..., d_inner + 2 * ngroups * d_state :]
    dt = jax.nn.softplus(dt + dt_bias)
    return jnp.exp(dt * (-jnp.exp(A_log)))


def eig_mamba1(
    x, in_proj_kernel, in_proj_bias, conv_weight, conv_bias,
    x_proj_kernel, dt_proj_kernel, dt_proj_bias, A_log,
    d_inner: int, dt_rank: int,
):
    """λ_t = exp(Δ_t[d]·A[d,n]) for Mamba-1, flattened over the
    (d_inner, d_state) lattice → (B, L, d_inner·N).

    Capability beyond the reference: its analysis cannot extract Mamba-1
    eigenvalues (ref analysis/eval_eig.py:176-190 assumes the SSD in_proj
    layout).  Δ here is the layer's actual step — in_proj x-half → depthwise
    causal conv → SiLU → x_proj dt-slice → dt_proj → softplus (the Mamba-1
    compute path, models/mamba2.py::Mamba1)."""
    from ..ops.conv import depthwise_causal_conv1d

    proj = jnp.einsum("bld,dp->blp", x, in_proj_kernel, precision=_HI)
    if in_proj_bias is not None:
        proj = proj + in_proj_bias
    xm = proj[..., :d_inner]
    xm = jax.nn.silu(depthwise_causal_conv1d(xm, conv_weight, conv_bias))
    dt_lr = jnp.einsum("bld,dr->blr", xm, x_proj_kernel, precision=_HI)[
        ..., :dt_rank
    ]
    dt = jax.nn.softplus(
        jnp.einsum("blr,rd->bld", dt_lr, dt_proj_kernel, precision=_HI)
        + dt_proj_bias
    )  # (B, L, d_inner)
    lam = jnp.exp(dt[..., None] * (-jnp.exp(A_log)))  # (B, L, d_inner, N)
    return lam.reshape(lam.shape[0], lam.shape[1], -1)


def eig_mamba2_lti(x, A, nheads: Optional[int] = None):
    """λ = exp(β·A), β ≡ 1 (ref eval_eig.py:192-205); constant over (B, L).
    ``A`` is the per-head (nheads,) parameter; nheads defaults to its length."""
    B, L, _ = x.shape
    lam = jnp.exp(-jax.nn.softplus(A))
    n = lam.shape[-1] if nheads is None else nheads
    return jnp.broadcast_to(lam, (B, L, n))


# ----------------------------------------------------------- SSM families


def eig_lru(layer_params: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
    """λ = exp(−exp(ν_log) + i·exp(θ_log)) (ref eval_eig.py:318-329)."""
    nu_log = jnp.asarray(layer_params["nu_log"])
    theta_log = jnp.asarray(layer_params["theta_log"])
    return cplx.exp((-jnp.exp(nu_log), jnp.exp(theta_log)))


def eig_s5(layer_params: Dict[str, Any]) -> Tuple[jax.Array, jax.Array]:
    """λ = exp(Λ · exp(log_step)) elementwise (ref eval_eig.py:303-316)."""
    step = jnp.exp(jnp.asarray(layer_params["log_step"]).flatten())
    lam = (jnp.asarray(layer_params["Lambda_re"]), jnp.asarray(layer_params["Lambda_im"]))
    return cplx.exp(cplx.scale(lam, step))


def _pair_from_param(p) -> Tuple[jax.Array, jax.Array]:
    """Accept either our (…, 2) trailing re/im layout or a complex array
    (reference checkpoints restored on CPU)."""
    arr = np.asarray(p) if not isinstance(p, jnp.ndarray) else p
    if np.iscomplexobj(arr):
        return (jnp.asarray(arr.real), jnp.asarray(arr.imag))
    arr = jnp.asarray(arr)
    if arr.shape[-1] == 2:
        return (arr[..., 0], arr[..., 1])
    return (arr, jnp.zeros_like(arr))


def eig_s4(
    layer_params: Dict[str, Any], idx: int, seq_len: int, eig_impl: str = "host",
) -> Tuple[np.ndarray, np.ndarray]:
    """Eigenvalues of the dense discretized DPLR Ā at channel ``idx``
    (ref eval_eig.py:281-301): discretize on device in pair arithmetic,
    eigendecompose via ops.eig (host LAPACK for reference parity, or the
    native on-device QR solver with eig_impl='device')."""
    from ..ops.eig import eigvals_pair

    step = jnp.exp(jnp.asarray(layer_params["log_step"])[0, idx])
    lam = (
        jnp.clip(jnp.asarray(layer_params["Lambda_re"])[:, idx], max=-1e-4),
        jnp.asarray(layer_params["Lambda_im"])[:, idx],
    )
    p_full = _pair_from_param(layer_params["P"])
    b_full = _pair_from_param(layer_params["B"])
    p = (p_full[0][:, idx], p_full[1][:, idx])
    b = (b_full[0][:, idx], b_full[1][:, idx])
    c_arr = jnp.asarray(layer_params["C"])
    c = (c_arr[:, idx, 0], c_arr[:, idx, 1])

    ab, _, _ = discrete_dplr(lam, p, p, b, c, step, seq_len)
    return eigvals_pair(ab, impl=eig_impl)
