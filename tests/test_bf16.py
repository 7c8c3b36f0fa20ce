"""Opt-in bf16 mixed-precision mode (`model.compute_dtype: bfloat16`).

The mode is a throughput knob for the LM-scale runs (WikiText shapes are
HBM-bound: XLA cost analysis shows ~19 flop/byte vs the ~240 needed to
saturate the MXU): activations and matmul operands ride bf16, while params,
the decay/normalizer recurrence math (softplus/exp/cumsum), softmax
attention, carried scan states, and the CE logsumexp all stay f32.

Guarantees verified here:
  * params remain f32 (checkpoints/spectra parity is dtype-independent),
  * forward/step outputs stay close to the f32 path (bf16 rounding only),
  * the SSD / linear-attention kernels accept bf16 without blowing up,
  * the analysis engine always strips `compute_dtype` (spectra stay f32).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.models.registry import build_models
from tlie_tpu.ops.linear_attention import chunked_linear_attention
from tlie_tpu.ops.ssd import ssd_chunked_scan

_MAMBA_TINY = {
    "input_dim": 1, "output_dim": 64, "layer": "mamba", "version": "mamba2",
    "num_layers": 2, "num_heads": 2, "hidden_dim": 32, "state_dim": 16,
    "conv_dim": 4, "expansion": 1, "dropout": 0.0, "glu": True,
    "norm": "layer", "prenorm": True, "mixer": "none", "mixer_dim": 32,
    "classifier": False, "pooling": "none", "dual": False,
    "embedding": True, "token_embedding": True, "vocab_size": 64,
    "max_pos_embed": 32, "seq_len": 32,
}

_ATT_TINY = {
    "input_dim": 1, "output_dim": 64, "layer": "transformer",
    "attention_fn": "lin-attention", "use_flash": False,
    "num_layers": 2, "hidden_dim": 32, "state_dim": 32, "num_heads": 2,
    "att_dropout": 0.0, "norm": "layer", "embedding": True,
    "vocab_size": 64, "max_pos_embed": 32, "mixer": "glu", "mixer_dim": 32,
    "dropout": 0.0, "classifier": False, "pooling": "mean", "dual": False,
    "seq_len": 32,
}

_NORM_ATT_EXTRA = {
    "attention_fn": "norm-attention", "norm_fn": "exp", "approx_fn": "none",
    "scale_B": False, "offset": True, "offset_init": "uniform", "dim_conv": 4,
}

_SSM_COMMON = {
    "output_dim": 64, "num_layers": 2, "hidden_dim": 32, "state_dim": 16,
    "dt_min": 0.001, "dt_max": 0.1, "activation": "full_glu",
    "dropout": 0.0, "norm": "layer", "pooling": "mean", "dual": False,
    "decode": False, "vocab_size": 64, "seq_len": 32, "input_dim": 64,
    "ssm_lr_vars": ["Lambda_re", "Lambda_im", "P", "B", "log_step"],
}

_LRU_TINY = {
    **_SSM_COMMON, "layer": "lru", "r_min": 0.5, "r_max": 0.95,
    # post-norm: the encoder's bf16 output flows straight into the SSM core,
    # exercising the f32 re-cast guard in SequenceLayer
    "prenorm": False,
    "ssm_lr_vars": ["nu_log", "theta_log", "gamma_log", "B_re", "B_im"],
}

_S5_TINY = {
    **_SSM_COMMON, "layer": "s5", "prenorm": True,
    "C_init": "lecun_normal", "discretization": "zoh", "conj_sym": True,
}

_S4_TINY = {**_SSM_COMMON, "layer": "s4", "prenorm": True}


def _init_and_apply(model_cfg, tokens, seed=0):
    _, eval_model, _ = build_models(dict(model_cfg), padded=False)
    rng = jax.random.PRNGKey(seed)
    params = eval_model.init({"params": rng, "dropout": rng}, tokens)["params"]
    out = eval_model.apply({"params": params}, tokens)
    return params, out


@pytest.mark.parametrize(
    "base",
    [
        _MAMBA_TINY,
        _ATT_TINY,
        {**_ATT_TINY, "attention_fn": "sm-attention"},
        {**_ATT_TINY, **_NORM_ATT_EXTRA},
        _LRU_TINY,
        _S5_TINY,
        _S4_TINY,
    ],
    ids=["mamba2", "lin-attention", "sm-attention", "norm-attention",
         "lru", "s5", "s4"],
)
def test_bf16_params_f32_and_forward_close(base):
    tokens = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, size=(4, 32)), jnp.int32
    )
    params32, out32 = _init_and_apply(base, tokens)
    cfg16 = {**base, "compute_dtype": "bfloat16"}
    params16, out16 = _init_and_apply(cfg16, tokens)

    # identical param trees, all f32 — the knob never touches storage dtype
    flat32 = jax.tree_util.tree_leaves_with_path(params32)
    flat16 = jax.tree_util.tree_leaves_with_path(params16)
    assert [p for p, _ in flat32] == [p for p, _ in flat16]
    for _, leaf in flat16:
        assert leaf.dtype == jnp.float32

    # same-params forward agrees up to bf16 rounding
    _, eval16, _ = build_models(dict(cfg16), padded=False)
    out16_same = eval16.apply({"params": params32}, tokens)
    scale = float(jnp.max(jnp.abs(out32))) + 1e-6
    err = float(jnp.max(jnp.abs(out16_same.astype(jnp.float32) - out32))) / scale
    assert err < 0.05, f"bf16 forward deviates {err:.3f} from f32"


def test_ssd_kernel_bf16_close_to_f32():
    rng = np.random.default_rng(1)
    B, L, H, P, N, G = 2, 64, 2, 8, 16, 1
    x = rng.normal(size=(B, L, H, P)).astype(np.float32)
    dt = np.logaddexp(0, rng.normal(size=(B, L, H))).astype(np.float32)
    A = -np.exp(rng.normal(size=(H,))).astype(np.float32)
    Bm = (rng.normal(size=(B, L, G, N)) / np.sqrt(N)).astype(np.float32)
    Cm = (rng.normal(size=(B, L, G, N)) / np.sqrt(N)).astype(np.float32)

    y32 = ssd_chunked_scan(
        jnp.asarray(x), jnp.asarray(dt), jnp.asarray(A), jnp.asarray(Bm),
        jnp.asarray(Cm), chunk_size=16,
    )
    y16 = ssd_chunked_scan(
        jnp.asarray(x, jnp.bfloat16), jnp.asarray(dt), jnp.asarray(A),
        jnp.asarray(Bm, jnp.bfloat16), jnp.asarray(Cm, jnp.bfloat16),
        chunk_size=16,
    )
    assert y16.dtype == jnp.bfloat16
    scale = float(jnp.max(jnp.abs(y32))) + 1e-6
    err = float(jnp.max(jnp.abs(y16.astype(jnp.float32) - y32))) / scale
    assert err < 0.05


def test_linear_attention_kernel_bf16_close_to_f32():
    rng = np.random.default_rng(2)
    B, L, H, D = 2, 64, 2, 8
    q = jax.nn.elu(jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)) + 1
    k = jax.nn.elu(jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)) + 1
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    y32 = chunked_linear_attention(q, k, v, chunk=16)
    y16 = chunked_linear_attention(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        chunk=16,
    )
    scale = float(jnp.max(jnp.abs(y32))) + 1e-6
    err = float(jnp.max(jnp.abs(y16.astype(jnp.float32) - y32))) / scale
    assert err < 0.05


def test_bf16_training_tracks_f32(tmp_path):
    """A short scanned-block run in bf16 must track the f32 loss curve."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training.loop import _make_state
    from tlie_tpu.training.scan_loop import (
        batch_indices,
        make_train_block,
        put_dataset,
    )

    ds_cfg = {
        "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
        "num_kv_pairs": 4, "vocab_size": 64, "num_train_examples": 256,
        "num_test_examples": 64, "fixed_size": True,
    }
    ds = SequenceDataset.registry["mqar"](**ds_cfg)
    ds.setup()
    data = put_dataset(ds.train_inputs, ds.train_labels)

    losses = {}
    for mode in ("f32", "bf16"):
        model = dict(_ATT_TINY)
        if mode == "bf16":
            model["compute_dtype"] = "bfloat16"
        raw = {
            "seed": 7, "save": None, "dataset": dict(ds_cfg),
            "train": {"total_steps": 20, "batch_size": 16, "lr": 3e-3,
                      "wd": 0.1, "eval_every": 100, "cosine_anneal": True,
                      "param_group": None},
            "model": model,
        }
        cfg = ExperimentConfig(raw).validate()
        cfg.derive_runtime_fields(ds)
        train_model, _, _ = build_models(cfg.model, False)
        state, _, rng = _make_state(cfg, train_model, integer_inputs=True)
        block = make_train_block(
            train_model, "layer", ("regular",), warmup=0, total_steps=20,
            cosine=True, lr_min=1e-6,
        )
        idx = batch_indices(np.random.default_rng(0), 256, 16, 20)
        _, loss = block(state, rng, data, idx, 0, 3e-3, 3e-3)
        losses[mode] = float(loss)

    assert np.isfinite(losses["bf16"])
    assert abs(losses["bf16"] - losses["f32"]) < 0.05 * abs(losses["f32"]) + 0.05


def test_analysis_strips_compute_dtype(tmp_path):
    """eval_eig pops compute_dtype before rebuilding models: spectra f32."""
    import inspect

    from tlie_tpu.analysis.eval_eig import eval_eig

    src = inspect.getsource(eval_eig)
    assert 'pop("compute_dtype"' in src
