"""Mamba-1 (`version: "mamba1"`) — layer oracle, init parity, analysis.

The reference supports the version flag by delegating to ``mamba_ssm``'s
torch Mamba-1 layer (ref models/mamba.py:304-305) but ships no config using
it and cannot analyse it (its get_eig_mamba2 assumes the SSD layout,
ref analysis/eval_eig.py:176-190).  Here the branch is a first-class family:
forward is pinned by a float64 sequential numpy oracle (SURVEY.md §4.1
strategy), and the eigen extraction has its own closed-form test.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.models.mamba2 import Mamba1


def _np_silu(x):
    return x / (1.0 + np.exp(-x))


def _np_softplus(x):
    return np.log1p(np.exp(x))


def _mamba1_oracle(u, p, d_inner, d_state, rank, d_conv):
    """Sequential float64 re-implementation of the whole Mamba-1 layer."""
    u = u.astype(np.float64)
    xz = u @ np.asarray(p["in_proj"]["kernel"], np.float64)
    x, z = xz[..., :d_inner], xz[..., d_inner:]

    w = np.asarray(p["conv1d"]["weight"], np.float64)  # (K, C)
    b = np.asarray(p["conv1d"]["bias"], np.float64)
    B_, L, _ = x.shape
    xc = np.zeros_like(x)
    for t in range(L):
        acc = b.copy()
        for k in range(d_conv):
            s = t - (d_conv - 1) + k
            if s >= 0:
                acc = acc + w[k] * x[:, s]
        xc[:, t] = acc
    x = _np_silu(xc)

    x_db = x @ np.asarray(p["x_proj"]["kernel"], np.float64)
    dt_lr = x_db[..., :rank]
    B_mat = x_db[..., rank : rank + d_state]
    C_mat = x_db[..., rank + d_state :]
    dt = _np_softplus(
        dt_lr @ np.asarray(p["dt_proj"]["kernel"], np.float64)
        + np.asarray(p["dt_proj"]["bias"], np.float64)
    )  # (B, L, d_inner)

    A = -np.exp(np.asarray(p["A_log"], np.float64))  # (d_inner, N)
    D = np.asarray(p["D"], np.float64)
    h = np.zeros((B_, d_inner, d_state))
    y = np.zeros((B_, L, d_inner))
    for t in range(L):
        a_t = np.exp(dt[:, t][:, :, None] * A)  # (B, d_inner, N)
        bx_t = (dt[:, t] * x[:, t])[:, :, None] * B_mat[:, t][:, None, :]
        h = a_t * h + bx_t
        y[:, t] = np.einsum("bdn,bn->bd", h, C_mat[:, t])
    y = y + D * x
    y = y * _np_silu(z)
    return y @ np.asarray(p["out_proj"]["kernel"], np.float64)


def test_mamba1_layer_matches_sequential_oracle():
    d_model, d_state, d_conv, expand = 8, 4, 4, 2
    layer = Mamba1(d_model=d_model, d_state=d_state, d_conv=d_conv, expand=expand)
    rng = np.random.RandomState(0)
    u = rng.randn(2, 16, d_model).astype(np.float32)
    params = layer.init(jax.random.PRNGKey(0), jnp.asarray(u))["params"]
    out = np.asarray(layer.apply({"params": params}, jnp.asarray(u)))
    ref = _mamba1_oracle(
        u, jax.device_get(params), expand * d_model, d_state, layer.rank, d_conv
    )
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=1e-5)


def test_mamba1_init_distributions():
    """mamba_ssm Mamba-1 init parity: S4D-real A_log, log-uniform Δ via the
    dt_proj bias, D = 1, dt_proj kernel U(±rank^-1/2)."""
    d_model, d_state = 32, 16
    layer = Mamba1(d_model=d_model, d_state=d_state)
    u = jnp.zeros((1, 4, d_model))
    params = layer.init(jax.random.PRNGKey(3), u)["params"]

    A_log = np.asarray(params["A_log"])
    assert A_log.shape == (2 * d_model, d_state)
    np.testing.assert_allclose(
        A_log, np.log(np.arange(1, d_state + 1))[None, :].repeat(2 * d_model, 0),
        rtol=1e-6,
    )
    np.testing.assert_allclose(np.asarray(params["D"]), 1.0)

    dt = _np_softplus(np.asarray(params["dt_proj"]["bias"], np.float64))
    assert dt.min() >= 0.001 * 0.99 and dt.max() <= 0.1 * 1.01

    k = np.asarray(params["dt_proj"]["kernel"])
    assert k.shape == (layer.rank, 2 * d_model)
    assert np.abs(k).max() <= layer.rank ** -0.5 + 1e-6

    # torch Mamba-1 tree layout (checkpoint-compat surface)
    assert set(params.keys()) == {
        "in_proj", "conv1d", "x_proj", "dt_proj", "A_log", "D", "out_proj"
    }


def test_mamba1_extractor_closed_form():
    from tlie_tpu.analysis.extractors import eig_mamba1

    d_model, d_state, d_conv, expand = 8, 4, 4, 2
    d_inner = expand * d_model
    layer = Mamba1(d_model=d_model, d_state=d_state, d_conv=d_conv, expand=expand)
    rng = np.random.RandomState(1)
    u = rng.randn(2, 12, d_model).astype(np.float32)
    p = jax.device_get(layer.init(jax.random.PRNGKey(1), jnp.asarray(u))["params"])

    lam = np.asarray(
        eig_mamba1(
            jnp.asarray(u),
            jnp.asarray(p["in_proj"]["kernel"]), None,
            jnp.asarray(p["conv1d"]["weight"]), jnp.asarray(p["conv1d"]["bias"]),
            jnp.asarray(p["x_proj"]["kernel"]),
            jnp.asarray(p["dt_proj"]["kernel"]), jnp.asarray(p["dt_proj"]["bias"]),
            jnp.asarray(p["A_log"]),
            d_inner=d_inner, dt_rank=layer.rank,
        )
    )
    assert lam.shape == (2, 12, d_inner * d_state)
    assert np.all(lam > 0) and np.all(lam < 1)

    # float64 oracle: Δ through the layer's actual step, λ = exp(Δ·A)
    x = (u.astype(np.float64) @ np.asarray(p["in_proj"]["kernel"], np.float64))[
        ..., :d_inner
    ]
    w = np.asarray(p["conv1d"]["weight"], np.float64)
    b = np.asarray(p["conv1d"]["bias"], np.float64)
    xc = np.zeros_like(x)
    for t in range(x.shape[1]):
        acc = b.copy()
        for k in range(d_conv):
            s = t - (d_conv - 1) + k
            if s >= 0:
                acc = acc + w[k] * x[:, s]
        xc[:, t] = acc
    x = _np_silu(xc)
    dt_lr = (x @ np.asarray(p["x_proj"]["kernel"], np.float64))[..., : layer.rank]
    dt = _np_softplus(
        dt_lr @ np.asarray(p["dt_proj"]["kernel"], np.float64)
        + np.asarray(p["dt_proj"]["bias"], np.float64)
    )
    lam_ref = np.exp(
        dt[..., None] * -np.exp(np.asarray(p["A_log"], np.float64))
    ).reshape(2, 12, -1)
    np.testing.assert_allclose(lam, lam_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_mamba1_end_to_end_with_analysis(tmp_path):
    """version: "mamba1" trains on MQAR and the analysis pipeline extracts
    per-(channel, state) spectra — a capability the reference lacks."""
    import os

    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    raw = {
        "seed": 7,
        "save": str(tmp_path / "ckpt-mamba1"),
        "dataset": {
            "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
            "num_kv_pairs": 4, "vocab_size": 64, "num_train_examples": 256,
            "num_test_examples": 64, "fixed_size": True,
        },
        "train": {
            "total_steps": 10, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
            "eval_every": 10, "cosine_anneal": True, "param_group": None,
        },
        "model": {
            "input_dim": 1, "output_dim": 64, "layer": "mamba",
            "version": "mamba1", "num_layers": 2, "hidden_dim": 16,
            "state_dim": 4, "num_heads": 2, "conv_dim": 4, "expansion": 2,
            "dropout": 0.0, "glu": True, "norm": "layer", "prenorm": True,
            "pooling": "none", "embedding": True, "token_embedding": True,
            "vocab_size": 64, "classifier": False, "dual": False,
        },
    }
    cfg = ExperimentConfig(raw).validate()
    ds = SequenceDataset.registry["mqar"](**cfg.dataset)
    ds.setup()
    cfg.derive_runtime_fields(ds)
    tl = ds.train_dataloader(batch_size=16, shuffle=True)
    el = ds.test_dataloader(batch_size=16, shuffle=False)
    path, perf = train(cfg, tl, el, ds.get_metrics(), None)
    assert path is not None and os.path.isdir(path)

    from tlie_tpu.analysis import eval_eig

    conf_args = {"batch_size": 16, "save_path": str(tmp_path / "an-m1") + "/"}
    loader = ds.test_dataloader(batch_size=16, shuffle=False)
    eig, eig_init, pct, *_ = eval_eig(
        cfg.raw, conf_args, None, cfg.dataset, loader, path, perf
    )
    d_inner, n = 2 * 16, 4
    assert eig.shape == (16, 32, d_inner * n, 2)
    assert np.all(eig > 0) and np.all(eig <= 1)
