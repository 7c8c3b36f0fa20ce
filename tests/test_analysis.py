"""Analysis engine: extractor oracles, binning parity, closed-form spectra.

Oracles follow SURVEY.md §4.1: closed-form eigenvalue relations computed
independently in numpy (float64) against the on-device fp32 extractors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.analysis.binning import (
    threshold_analysis,
    threshold_analysis_ssm,
)
from tlie_tpu.analysis.extractors import (
    eig_att_linear,
    eig_att_norm,
    eig_att_softmax,
    eig_lru,
    eig_mamba2,
    eig_s4,
    eig_s5,
)
from tlie_tpu.models.initializers import make_dplr_hippo


def test_softmax_eta_matches_float64_reference():
    """η from the stabilised on-device path vs the reference's float64 host
    formulation (ref eval_eig.py:43-95), reproduced here in numpy."""
    rng = np.random.RandomState(0)
    B, L, D, H = 2, 24, 8, 2
    d_qk = D
    x = rng.randn(B, L, D).astype(np.float32)
    kernel = rng.randn(D, 2 * d_qk + D).astype(np.float32) * 0.2
    bias = rng.randn(2 * d_qk + D).astype(np.float32) * 0.1

    eta = np.asarray(
        eig_att_softmax(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias), d_qk, D, H)
    )

    # float64 host reference — faithful transcription of ref eval_eig.py:57-95:
    # scores AND the repeated row-max are BOTH zero-masked before the
    # subtraction, so masked entries contribute exp(0) = 1 to nu.
    qkv = (x @ kernel + bias).astype(np.float64)
    hd = d_qk // H
    q = qkv[..., :d_qk].reshape(B, L, H, hd)
    k = qkv[..., d_qk : 2 * d_qk].reshape(B, L, H, hd)
    scores = np.einsum("bthd,bshd->btsh", q, k)
    mask = np.tril(np.ones((L, L)))[None, :, :, None]
    scores = scores * mask
    m = scores.max(axis=2)
    scores_max_r = m[:, :, None, :] * mask  # ref :67-69 zero-masks the max too
    nu = np.exp(scores - scores_max_r).sum(axis=2)
    eta_ref = nu[:, :-1] / nu[:, 1:] * np.exp(m[:, :-1] - m[:, 1:])
    np.testing.assert_allclose(eta, eta_ref, rtol=1e-4, atol=1e-5)


def test_linear_eta_matches_quadratic_host_reference():
    rng = np.random.RandomState(1)
    B, L, D, H = 2, 16, 4, 1
    x = rng.randn(B, L, D).astype(np.float32)
    kernel = rng.randn(D, 3 * D).astype(np.float32) * 0.3
    bias = np.zeros(3 * D, np.float32)
    eta = np.asarray(
        eig_att_linear(jnp.asarray(x), jnp.asarray(kernel), jnp.asarray(bias), D, D, H)
    )
    # O(L²) float64 reference (ref eval_eig.py:97-135)
    qkv = (x @ kernel).astype(np.float64)
    q = qkv[..., :D].reshape(B, L, H, D)
    k = qkv[..., D : 2 * D].reshape(B, L, H, D)
    elu = lambda v: np.where(v > 0, v, np.expm1(v))
    q, k = elu(q) + 1, elu(k) + 1
    scores = np.einsum("bthd,bshd->btsh", q, k) * np.tril(np.ones((L, L)))[None, :, :, None]
    nu = scores.sum(axis=2)
    eta_ref = nu[:, :-1] / nu[:, 1:]
    np.testing.assert_allclose(eta, eta_ref, rtol=1e-4, atol=1e-5)


def test_norm_eta_offset_and_normfn():
    rng = np.random.RandomState(2)
    B, L, D, H = 1, 12, 6, 2
    d_qk = 4
    width = D + 2 * d_qk + H
    x = rng.randn(B, L, D).astype(np.float32)
    kernel = rng.randn(D, width).astype(np.float32) * 0.2
    offset = np.array([0.5, 1.5], np.float32)
    eta = np.asarray(
        eig_att_norm(
            jnp.asarray(x), jnp.asarray(kernel), None, d_qk, D, H,
            norm_fn="softplus", offset=jnp.asarray(offset),
        )
    )
    n_proj = (x @ kernel)[..., D + 2 * d_qk :].astype(np.float64)
    n = np.exp(-np.log1p(np.exp(n_proj + offset)))
    eta_ref = n[:, 1:] / n[:, :-1]
    np.testing.assert_allclose(eta, eta_ref, rtol=1e-4, atol=1e-5)


def test_mamba2_lambda_closed_form():
    rng = np.random.RandomState(3)
    B, L, D = 1, 8, 16
    d_inner, g, n, nheads = 16, 1, 4, 2
    width = d_inner + 2 * g * n + nheads
    x = rng.randn(B, L, D).astype(np.float32)
    kernel = rng.randn(D, width).astype(np.float32) * 0.2
    dt_bias = rng.randn(nheads).astype(np.float32)
    A_log = rng.randn(nheads).astype(np.float32)
    lam = np.asarray(
        eig_mamba2(
            jnp.asarray(x), jnp.asarray(kernel), None, jnp.asarray(dt_bias),
            jnp.asarray(A_log), d_inner, g, n, nheads,
        )
    )
    dt = (x @ kernel)[..., d_inner + 2 * g * n :].astype(np.float64)
    dt = np.log1p(np.exp(dt + dt_bias))
    lam_ref = np.exp(dt * (-np.exp(A_log)))
    np.testing.assert_allclose(lam, lam_ref, rtol=1e-4, atol=1e-6)


def test_mamba2_extraction_ngroups2_end_to_end():
    """The full attention-family extraction path must honour config
    ``ngroups``: grouped B/C shifts the dt slice offset in the in_proj
    layout (ref models/mamba.py:124,137-143).  Regression for the round-4
    hardcoded ``ngroups=1`` in analysis/eval_eig.py, which would silently
    slice C-columns as dt for any grouped checkpoint."""
    from tlie_tpu.analysis.eval_eig import (
        _extract_attention_family, _make_collector,
    )
    from tlie_tpu.models.registry import build_models

    g, n, heads, d = 2, 4, 2, 16
    model_config = {
        "layer": "mamba", "version": "mamba2", "pseudoLTI": False,
        "input_dim": 1, "output_dim": 8, "hidden_dim": d, "state_dim": n,
        "num_heads": heads, "num_layers": 2, "conv_dim": 4, "expansion": 1,
        "dropout": 0.0, "glu": True, "norm": "layer", "prenorm": True,
        "pooling": "none", "dual": False, "ngroups": g,
        "token_embedding": True, "embedding": True, "vocab_size": 16,
        "seq_len": 12,
    }
    _, eval_model, _ = build_models(model_config, padded=False)
    x = jnp.asarray(np.random.RandomState(0).randint(0, 16, size=(3, 12)))
    params = eval_model.init(jax.random.PRNGKey(1), x)["params"]
    d_inner = d  # expansion 1
    # in_proj width must reflect the grouped layout
    assert params["blocks_0"]["mamba"]["in_proj"]["kernel"].shape[1] == (
        d_inner + 2 * g * n + heads
    )

    eta = _extract_attention_family(eval_model, params, x, model_config)
    assert eta.shape == (3, 12, heads, 2)

    # float64 numpy oracle straight from the grouped in_proj layout
    collector = _make_collector(eval_model, "mamba")
    acts = [np.asarray(a, np.float64) for a in collector(params, x)]
    for i in range(2):
        mp = params[f"blocks_{i}"]["mamba"]
        proj = acts[i] @ np.asarray(mp["in_proj"]["kernel"], np.float64)
        dt = proj[..., d_inner + 2 * g * n :]
        dt = np.log1p(np.exp(dt + np.asarray(mp["dt_bias"], np.float64)))
        lam_ref = np.exp(dt * (-np.exp(np.asarray(mp["A_log"], np.float64))))
        np.testing.assert_allclose(eta[..., i], lam_ref, rtol=1e-4, atol=1e-6)


def test_lru_s5_closed_form_spectra():
    rng = np.random.RandomState(4)
    N = 16
    lp = {
        "nu_log": rng.randn(N).astype(np.float32) * 0.3,
        "theta_log": rng.randn(N).astype(np.float32) * 0.3,
    }
    re, im = eig_lru(lp)
    lam_ref = np.exp(-np.exp(lp["nu_log"]) + 1j * np.exp(lp["theta_log"]))
    np.testing.assert_allclose(np.asarray(re) + 1j * np.asarray(im), lam_ref, atol=1e-6)

    lp5 = {
        "Lambda_re": -np.abs(rng.randn(N)).astype(np.float32),
        "Lambda_im": rng.randn(N).astype(np.float32),
        "log_step": rng.randn(N, 1).astype(np.float32) * 0.1 - 3,
    }
    re, im = eig_s5(lp5)
    lam = lp5["Lambda_re"] + 1j * lp5["Lambda_im"]
    lam_ref = np.exp(lam * np.exp(lp5["log_step"][:, 0]))
    np.testing.assert_allclose(np.asarray(re) + 1j * np.asarray(im), lam_ref, rtol=1e-5, atol=1e-6)


def test_s4_spectrum_matches_host_numpy():
    """Pair-complex discretize + host eigvals vs all-numpy reference."""
    N, H, L = 8, 3, 16
    lam_np, p_np, b_np, _, _ = make_dplr_hippo(N)
    rng = np.random.RandomState(5)
    lp = {
        "Lambda_re": np.tile(lam_np.real[:, None], (1, H)).astype(np.float32),
        "Lambda_im": np.tile(lam_np.imag[:, None], (1, H)).astype(np.float32),
        "P": np.tile(
            np.stack([p_np.real, p_np.imag], -1)[:, None, :], (1, H, 1)
        ).astype(np.float32),
        "B": np.tile(
            np.stack([b_np.real, b_np.imag], -1)[:, None, :], (1, H, 1)
        ).astype(np.float32),
        "C": rng.randn(N, H, 2).astype(np.float32),
        "log_step": (rng.rand(1, H).astype(np.float32) * 0.1 - 3),
    }
    re, im = eig_s4(lp, idx=1, seq_len=L)
    w = np.sort_complex(np.asarray(re) + 1j * np.asarray(im))

    # all-numpy reference at channel 1
    idx = 1
    lam_h = np.clip(lp["Lambda_re"][:, idx], None, -1e-4) + 1j * lp["Lambda_im"][:, idx]
    p_h = lp["P"][:, idx, 0] + 1j * lp["P"][:, idx, 1]
    b_h = lp["B"][:, idx, 0] + 1j * lp["B"][:, idx, 1]
    step = np.exp(lp["log_step"][0, idx])
    A = np.diag(lam_h) - np.outer(p_h, p_h.conj())
    I = np.eye(N)
    A0 = (2.0 / step) * I + A
    D = np.diag(1.0 / ((2.0 / step) - lam_h))
    qc = p_h.conj().reshape(1, -1)
    p2 = p_h.reshape(-1, 1)
    A1 = D - (D @ p2 * (1.0 / (1 + (qc @ D @ p2))) * qc @ D)
    Ab = A1 @ A0
    w_ref = np.sort_complex(np.linalg.eigvals(Ab))
    np.testing.assert_allclose(w, w_ref, rtol=1e-3, atol=1e-4)


def test_threshold_binning_parity():
    """Binning boundary conventions: closed middle intervals double-count
    boundary values; negatives only fall in bins they clear."""
    vals = np.array([0.05, 0.1, 0.5, 0.95, 1.0, 5.0, 200.0, -0.5])
    eig = vals.reshape(1, -1, 1, 1)
    th = np.array([0.1, 0.5, 0.9, 1.0, 10, 100])
    pct = threshold_analysis(eig, th)
    n = len(vals)
    # first bin [0, 0.1]: 0.05, 0.1 → 2/8
    assert pct[0, 0, 0, 0] == pytest.approx(2 / n * 100)
    # bin [0.1, 0.5]: 0.1, 0.5 (both boundaries) → 2/8
    assert pct[1, 0, 0, 0] == pytest.approx(2 / n * 100)
    # last bin > 100: 200 → 1/8
    assert pct[-1, 0, 0, 0] == pytest.approx(1 / n * 100)
    # percentages need not sum to 100 (overlaps + negatives) — reference behavior
    ssm = threshold_analysis_ssm(np.abs(vals).reshape(-1, 1), th)
    assert ssm.shape == (7, 1)
