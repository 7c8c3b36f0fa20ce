"""LRU / S5 / S4 model-math tests against independent numpy complex oracles.

The oracles re-derive the published math (Orvieto et al. LRU; Smith et al.
S5; Gu et al. S4) in plain numpy complex arithmetic — independent of the
framework's pair-complex code paths — covering the closed-form eigenvalue
relations SURVEY.md §4.1 lists as the reference's implicit invariants.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.models.backbone import BatchClassificationModel
from tlie_tpu.models.lru import LRU, init_LRU
from tlie_tpu.models.s4 import S4, discrete_dplr, init_S4, s4_kernel_dplr
from tlie_tpu.models.s5 import init_S5
from tlie_tpu.models.initializers import make_dplr_hippo
from tlie_tpu.utils import cplx


# ---------------------------------------------------------------- LRU


def test_lru_forward_matches_numpy_complex():
    B, L, H, N = 2, 16, 6, 8
    model = LRU(d_hidden=N, d_model=H, r_min=0.4, r_max=0.9, scan_impl="assoc")
    u = jax.random.normal(jax.random.PRNGKey(1), (B, L, H))
    params = model.init(jax.random.PRNGKey(0), u)["params"]
    y = model.apply({"params": params}, u)

    p = {k: np.asarray(v) for k, v in params.items()}
    lam = np.exp(-np.exp(p["nu_log"]) + 1j * np.exp(p["theta_log"]))
    b_norm = (p["B_re"] + 1j * p["B_im"]) * np.exp(p["gamma_log"])[:, None]
    c = p["C_re"] + 1j * p["C_im"]
    un = np.asarray(u)
    y_ref = np.zeros((B, L, H))
    for bi in range(B):
        h = np.zeros(N, complex)
        for t in range(L):
            h = lam * h + b_norm @ un[bi, t]
            y_ref[bi, t] = (c @ h).real + p["D"] * un[bi, t]
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_lru_init_ring_distribution():
    """|λ| must land in [r_min, r_max] and γ = sqrt(1−|λ|²) (ref models/lru.py:26-39)."""
    ssm = init_LRU(64, 8, r_min=0.9, r_max=0.99)
    model = ssm()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 4, 8)))["params"]
    lam_abs = np.exp(-np.exp(np.asarray(params["nu_log"])))
    assert lam_abs.min() >= 0.9 - 1e-6 and lam_abs.max() <= 0.99 + 1e-6
    gamma = np.exp(np.asarray(params["gamma_log"]))
    np.testing.assert_allclose(gamma, np.sqrt(1 - lam_abs**2), rtol=1e-5)


# ---------------------------------------------------------------- S5


def test_s5_forward_matches_numpy_complex():
    B, L, H, P = 2, 12, 4, 8
    ssm = init_S5(P, H, num_blocks=2, C_init="lecun_normal", conj_sym=True)
    model = ssm(scan_impl="assoc")
    u = jax.random.normal(jax.random.PRNGKey(1), (B, L, H))
    params = model.init(jax.random.PRNGKey(0), u)["params"]
    y = model.apply({"params": params}, u)

    p = {k: np.asarray(v) for k, v in params.items()}
    lam = p["Lambda_re"] + 1j * p["Lambda_im"]
    b_tilde = p["B"][..., 0] + 1j * p["B"][..., 1]
    c_tilde = p["C"][..., 0] + 1j * p["C"][..., 1]
    step = np.exp(p["log_step"][:, 0])
    lam_bar = np.exp(lam * step)
    b_bar = ((lam_bar - 1) / lam)[:, None] * b_tilde
    un = np.asarray(u)
    y_ref = np.zeros((B, L, H))
    for bi in range(B):
        x = np.zeros(lam.shape[0], complex)
        for t in range(L):
            x = lam_bar * x + b_bar @ un[bi, t]
            y_ref[bi, t] = 2 * (c_tilde @ x).real + p["D"] * un[bi, t]
    np.testing.assert_allclose(np.asarray(y), y_ref, rtol=1e-4, atol=1e-4)


def test_s5_bilinear_discretization():
    """Bilinear Λ̄ must match the numpy Tustin formula."""
    from tlie_tpu.models.s5 import discretize_bilinear

    rng = np.random.RandomState(0)
    lam_c = -np.abs(rng.randn(8)) + 1j * rng.randn(8)
    b_c = rng.randn(8, 3) + 1j * rng.randn(8, 3)
    step = np.abs(rng.rand(8)) * 0.1
    lam_bar, b_bar = discretize_bilinear(
        (jnp.asarray(lam_c.real), jnp.asarray(lam_c.imag)),
        (jnp.asarray(b_c.real), jnp.asarray(b_c.imag)),
        jnp.asarray(step),
    )
    bl = 1.0 / (1 - step / 2 * lam_c)
    lam_ref = bl * (1 + step / 2 * lam_c)
    b_ref = (bl * step)[:, None] * b_c
    np.testing.assert_allclose(cplx.to_complex(lam_bar), lam_ref, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cplx.to_complex(b_bar), b_ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------- S4


def _tiny_s4(L=32, N=8, H=3, decode=False):
    ssm = init_S4(N, H, C_init="complex_normal", seq_len=L, decode=decode)
    return ssm()


def test_s4_cnn_matches_rnn_mode():
    """CNN (FFT kernel) mode and RNN (discretized scan) mode must agree —
    the reference's two-path invariant (ref models/s4.py:169-179)."""
    L, N, H = 32, 8, 3
    cnn = _tiny_s4(L, N, H, decode=False)
    rnn = _tiny_s4(L, N, H, decode=True)
    u = jax.random.normal(jax.random.PRNGKey(1), (2, L, H))
    params = cnn.init(jax.random.PRNGKey(0), u)["params"]
    y_cnn = cnn.apply({"params": params}, u)
    y_rnn = rnn.apply({"params": params}, u)
    np.testing.assert_allclose(np.asarray(y_cnn), np.asarray(y_rnn), rtol=1e-3, atol=3e-3)


def test_discrete_dplr_matches_numpy():
    """Pair-complex DPLR discretization vs plain numpy complex linalg."""
    rng = np.random.RandomState(0)
    N, L = 8, 16
    lam_np, p_np, b_np, _, _ = make_dplr_hippo(N)
    lam_np = np.clip(lam_np.real, None, -1e-4) + 1j * lam_np.imag
    c_np = rng.randn(N) + 1j * rng.randn(N)
    step = 0.05

    topair = lambda z: (jnp.asarray(z.real.astype(np.float32)), jnp.asarray(z.imag.astype(np.float32)))
    ab, bb, cb = discrete_dplr(
        topair(lam_np), topair(p_np), topair(p_np), topair(b_np), topair(c_np),
        step, L,
    )

    # numpy reference (bilinear formulas)
    A = np.diag(lam_np) - np.outer(p_np, p_np.conj())
    I = np.eye(N)
    A0 = (2.0 / step) * I + A
    D = np.diag(1.0 / ((2.0 / step) - lam_np))
    qc = p_np.conj().reshape(1, -1)
    p2 = p_np.reshape(-1, 1)
    A1 = D - (D @ p2 * (1.0 / (1 + (qc @ D @ p2))) * qc @ D)
    Ab = A1 @ A0
    Bb = 2 * A1 @ b_np.reshape(-1, 1)
    Cb = (c_np.reshape(1, -1) @ np.linalg.inv(I - np.linalg.matrix_power(Ab, L)).conj()).conj()

    np.testing.assert_allclose(cplx.to_complex(ab), Ab, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(cplx.to_complex(bb), Bb, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(cplx.to_complex(cb), Cb, rtol=1e-3, atol=1e-4)


def test_s4_kernel_matches_direct_materialization():
    """Generating-function kernel vs K_l = C̄ Ā^l B̄ materialised directly."""
    N, H, L = 8, 2, 16
    model = _tiny_s4(L, N, H)
    u = jnp.ones((1, L, H))
    params = model.init(jax.random.PRNGKey(0), u)["params"]
    p = {k: np.asarray(v) for k, v in params.items()}

    lam = (jnp.clip(jnp.asarray(p["Lambda_re"]), max=-1e-4), jnp.asarray(p["Lambda_im"]))
    pp = (jnp.asarray(p["P"][..., 0]), jnp.asarray(p["P"][..., 1]))
    bb_ = (jnp.asarray(p["B"][..., 0]), jnp.asarray(p["B"][..., 1]))
    cc = (jnp.asarray(p["C"][..., 0]), jnp.asarray(p["C"][..., 1]))
    step = np.exp(p["log_step"][0])

    K = np.asarray(s4_kernel_dplr(lam, pp, bb_, cc, jnp.asarray(step), L))

    for h in range(H):
        lam_h = np.clip(p["Lambda_re"][:, h], None, -1e-4) + 1j * p["Lambda_im"][:, h]
        p_h = p["P"][:, h, 0] + 1j * p["P"][:, h, 1]
        b_h = p["B"][:, h, 0] + 1j * p["B"][:, h, 1]
        c_h = p["C"][:, h, 0] + 1j * p["C"][:, h, 1]
        A = np.diag(lam_h) - np.outer(p_h, p_h.conj())
        I = np.eye(N)
        s = step[h]
        A0 = (2.0 / s) * I + A
        D = np.diag(1.0 / ((2.0 / s) - lam_h))
        qc = p_h.conj().reshape(1, -1)
        p2 = p_h.reshape(-1, 1)
        A1 = D - (D @ p2 * (1.0 / (1 + (qc @ D @ p2))) * qc @ D)
        Ab = A1 @ A0
        Bb = 2 * A1 @ b_h.reshape(-1, 1)
        Cb = (
            c_h.reshape(1, -1) @ np.linalg.inv(I - np.linalg.matrix_power(Ab, L)).conj()
        ).conj()
        K_ref = np.array(
            [(Cb @ np.linalg.matrix_power(Ab, l) @ Bb)[0, 0].real for l in range(L)]
        )
        np.testing.assert_allclose(K[h], K_ref, rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------- backbone


@pytest.mark.parametrize("norm,pooling", [("layer", "mean"), ("batch", "none")])
def test_backbone_end_to_end_shapes(norm, pooling):
    ssm = init_LRU(8, 16, r_min=0.5, r_max=0.9)
    model = BatchClassificationModel(
        ssm=ssm, d_output=10, d_model=16, n_layers=2,
        activation="half_glu1", dropout=0.1, training=True,
        pooling=pooling, prenorm=True, norm=norm,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 20, 16))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}, x
    )
    out = model.apply(
        variables, x, rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"] if norm == "batch" else False,
    )
    logits = out[0] if norm == "batch" else out
    expected = (4, 10) if pooling == "mean" else (4, 20, 10)
    assert logits.shape == expected
    # log-softmax output sums to 1 in prob space
    np.testing.assert_allclose(np.exp(np.asarray(logits)).sum(-1), 1.0, rtol=1e-4)
    # reference-compatible parameter tree
    params = variables["params"]
    assert "encoder" in params and "decoder" in params
    assert "layers_0" in params["encoder"] and "seq" in params["encoder"]["layers_0"]


def test_backbone_padded_masked_meanpool():
    ssm = init_LRU(8, 16)
    model = BatchClassificationModel(
        ssm=ssm, d_output=5, d_model=16, n_layers=1,
        activation="gelu", dropout=0.0, training=False,
        pooling="mean", prenorm=True, norm="layer", padded=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 10, 16))
    lengths = jnp.array([4.0, 10.0, 7.0])
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        (x, lengths),
    )
    logits = model.apply(variables, (x, lengths))
    assert logits.shape == (3, 5)


def test_ssd_learnable_init_states_and_dt_limit_plumbing():
    """SSD API tail (ref models/mamba.py:38-40,66-67,119,125-128):
    ``learnable_init_states`` adds a zeros (H, P, N) param that seeds the
    scan state; ``dt_limit`` clamps the post-softplus dt.  Zeros init
    states must reproduce the plain module bit-for-bit."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tlie_tpu.models.mamba2 import SSD

    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 16))
    base = dict(d_model=16, d_state=8, d_conv=4, headdim=8)
    plain = SSD(**base)
    learn = SSD(**base, learnable_init_states=True)
    vp = plain.init({"params": rng, "dropout": rng}, x)
    vl = learn.init({"params": rng, "dropout": rng}, x)
    h0 = vl["params"]["init_states"]
    assert h0.shape == (2, 8, 8) and not np.any(np.asarray(h0))
    with jax.default_matmul_precision("highest"):
        y_plain = plain.apply(vp, x)
        y_learn = learn.apply(vl, x)
        np.testing.assert_array_equal(np.asarray(y_plain), np.asarray(y_learn))
        # a nonzero trained state must flow into the output
        vl2 = {"params": dict(vl["params"], init_states=jnp.ones_like(h0))}
        y_seeded = learn.apply(vl2, x)
        assert np.abs(np.asarray(y_seeded - y_learn)).max() > 1e-4
        # dt_limit plumbing: an extreme clamp must change the output
        clamped = SSD(**base, dt_limit=(0.0, 1e-4))
        y_clamped = clamped.apply(vp, x)
        assert np.abs(np.asarray(y_clamped - y_plain)).max() > 1e-4
