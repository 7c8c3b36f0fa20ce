"""Decode/serving parity: the O(1)-state step path equals the full forward.

For every family, a teacher-forced scan of ``inference.Decoder.step`` over a
token sequence must reproduce the parallel training forward's per-position
logits (the step path maintains recurrent state / conv tails / KV caches
incrementally).  The reference has no decode path at all; these tests pin
ours against the same full-sequence graphs the trainer runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.inference import Decoder
from tlie_tpu.models.registry import build_models

B, L, V = 2, 24, 32


def _tokens(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, V, size=(B, L)), jnp.int32)


def _full_and_stepwise(model_cfg, seed=0, padded=False):
    _, eval_model, _ = build_models(dict(model_cfg), padded)
    toks = _tokens(seed)
    variables = eval_model.init(jax.random.PRNGKey(seed), toks)
    full = eval_model.apply(variables, toks)
    dec = Decoder(model_cfg, variables["params"],
                  batch_stats=variables.get("batch_stats"))
    stepwise = dec.stepwise_logits(toks)
    return np.asarray(full), np.asarray(stepwise), dec, toks


def _assert_close(full, stepwise, rtol=2e-4, atol=2e-4):
    assert full.shape == stepwise.shape
    np.testing.assert_allclose(stepwise, full, rtol=rtol, atol=atol)


# ---------------------------------------------------------------- SSM stack

_SSM_BASE = {
    "input_dim": V, "output_dim": V, "hidden_dim": 8, "state_dim": 8,
    "num_layers": 2, "dropout": 0.0, "pooling": "none", "prenorm": True,
    "norm": "layer", "activation": "full_glu", "classifier": False,
    "dual": False, "seq_len": L,
}


def test_decode_lru():
    full, stepwise, _, _ = _full_and_stepwise({**_SSM_BASE, "layer": "lru"})
    _assert_close(full, stepwise)


def test_decode_lru_postnorm_batchnorm_half_glu():
    cfg = {**_SSM_BASE, "layer": "lru", "prenorm": False, "norm": "batch",
           "activation": "half_glu1"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_s5_zoh():
    cfg = {**_SSM_BASE, "layer": "s5", "num_blocks": 2, "conj_sym": True,
           "discretization": "zoh", "C_init": "lecun_normal",
           "activation": "half_glu2"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_s5_bilinear_clip():
    cfg = {**_SSM_BASE, "layer": "s5", "num_blocks": 2, "conj_sym": False,
           "discretization": "bilinear", "clip_eigs": True,
           "C_init": "complex_normal", "activation": "gelu"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_s4_cnn_vs_step():
    # CNN (FFT) mode vs the dense DPLR recurrence agree to ~1e-3 (the same
    # tolerance class as the existing CNN≡RNN test)
    cfg = {**_SSM_BASE, "layer": "s4", "C_init": "complex_normal"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise, rtol=5e-3, atol=5e-3)


def test_decode_s5_bidirectional_rejected():
    cfg = {**_SSM_BASE, "layer": "s5", "num_blocks": 2,
           "bidirectional": True, "C_init": "lecun_normal"}
    _, eval_model, _ = build_models(dict(cfg), False)
    variables = eval_model.init(jax.random.PRNGKey(0), _tokens())
    with pytest.raises(ValueError, match="bidirectional"):
        Decoder(cfg, variables["params"])


# ------------------------------------------------------------- Transformer

_TF_BASE = {
    "layer": "transformer", "input_dim": 1, "output_dim": V,
    "hidden_dim": 8, "state_dim": 8, "num_heads": 2, "num_layers": 2,
    "att_dropout": 0.0, "dropout": 0.0, "norm": "layer", "embedding": True,
    "vocab_size": V, "max_pos_embed": L, "mixer": "none", "mixer_dim": 16,
    "classifier": False, "pooling": "none", "dual": False, "use_flash": False,
    "dim_conv": 0,
}


def test_decode_lin_attention_conv_glu():
    cfg = {**_TF_BASE, "attention_fn": "lin-attention", "dim_conv": 3,
           "conv_type": "full", "mixer": "glu"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_lin_attention_mlp_gate():
    cfg = {**_TF_BASE, "attention_fn": "lin-attention", "mixer": "mlp",
           "use_gate": True}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_sm_attention_partial_conv():
    cfg = {**_TF_BASE, "attention_fn": "sm-attention", "dim_conv": 3,
           "conv_type": "qk", "mixer": "none"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_norm_attention():
    cfg = {**_TF_BASE, "attention_fn": "norm-attention", "norm_fn": "softplus",
           "approx_fn": "elu", "scale_B": True, "offset": True,
           "offset_init": "uniform", "dim_conv": 3, "conv_type": "full",
           "mixer": "hybrid"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_norm_attention_exp_noconv():
    cfg = {**_TF_BASE, "attention_fn": "norm-attention", "norm_fn": "exp",
           "approx_fn": "none", "scale_B": False, "offset": False,
           "offset_init": "uniform", "dim_conv": 0, "mixer": "none"}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


# ------------------------------------------------------------------- Mamba

_MB_BASE = {
    "layer": "mamba", "version": "mamba2", "input_dim": 1, "output_dim": V,
    "hidden_dim": 8, "state_dim": 4, "num_heads": 2, "num_layers": 2,
    "conv_dim": 4, "expansion": 1, "dropout": 0.0, "glu": True,
    "norm": "layer", "prenorm": True, "classifier": False, "pooling": "none",
    "dual": False, "embedding": True, "token_embedding": True,
    "vocab_size": V, "mixer": "none", "mixer_dim": 8,
}


def test_decode_mamba2():
    full, stepwise, _, _ = _full_and_stepwise(_MB_BASE)
    _assert_close(full, stepwise)


def test_decode_mamba2_ngroups_init_states():
    cfg = {**_MB_BASE, "ngroups": 2, "learnable_init_states": True,
           "glu": False, "prenorm": False}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_mamba2_pseudo_lti():
    cfg = {**_MB_BASE, "pseudoLTI": True, "dt_limit": (0.0, 0.5)}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


def test_decode_mamba1():
    cfg = {**_MB_BASE, "version": "mamba1", "expansion": 2, "state_dim": 4}
    full, stepwise, _, _ = _full_and_stepwise(cfg)
    _assert_close(full, stepwise)


# -------------------------------------------------------------- generation

def test_generate_greedy_matches_stepwise():
    cfg = {**_TF_BASE, "attention_fn": "lin-attention", "mixer": "glu"}
    _, _, dec, toks = _full_and_stepwise(cfg)
    prompt = toks[:, :8]
    out = dec.generate(prompt, n_new=6)
    assert out.shape == (B, 14)
    assert np.array_equal(np.asarray(out[:, :8]), np.asarray(prompt))
    # greedy generation is deterministic
    out2 = dec.generate(prompt, n_new=6)
    assert np.array_equal(np.asarray(out), np.asarray(out2))
    # the first generated token is the argmax of the stepwise logits at the
    # last prompt position
    sw = dec.stepwise_logits(prompt)
    tok0 = np.argmax(np.asarray(sw[:, -1]), axis=-1)
    assert np.array_equal(np.asarray(out[:, 8]), tok0)


def test_generate_sampled_mamba2():
    _, _, dec, toks = _full_and_stepwise(_MB_BASE)
    out = dec.generate(toks[:, :4], n_new=5, temperature=1.0,
                       rng=jax.random.PRNGKey(3))
    assert out.shape == (B, 9)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() < V


def test_decode_classifier_rejected():
    cfg = {**_TF_BASE, "attention_fn": "lin-attention", "classifier": True}
    with pytest.raises(ValueError, match="classifier"):
        Decoder(cfg, {})


def test_generate_top_k_top_p():
    cfg = {**_TF_BASE, "attention_fn": "lin-attention", "mixer": "glu"}
    _, _, dec, toks = _full_and_stepwise(cfg)
    prompt = toks[:, :4]
    # top_k=1 sampling must equal greedy decoding regardless of temperature
    greedy = dec.generate(prompt, n_new=6)
    topk1 = dec.generate(prompt, n_new=6, temperature=2.0,
                         rng=jax.random.PRNGKey(0), top_k=1)
    assert np.array_equal(np.asarray(greedy), np.asarray(topk1))
    # tiny top_p keeps only the argmax token -> also equals greedy
    topp = dec.generate(prompt, n_new=6, temperature=2.0,
                        rng=jax.random.PRNGKey(1), top_p=1e-6)
    assert np.array_equal(np.asarray(greedy), np.asarray(topp))
    # permissive settings still produce valid tokens
    out = dec.generate(prompt, n_new=6, temperature=1.0,
                       rng=jax.random.PRNGKey(2), top_k=8, top_p=0.9)
    assert np.asarray(out).min() >= 0 and np.asarray(out).max() < V


def test_decoder_from_checkpoint(tmp_path):
    from tlie_tpu.training.checkpoint import save_checkpoint

    cfg = {**_MB_BASE}
    _, eval_model, _ = build_models(dict(cfg), False)
    toks = _tokens()
    variables = eval_model.init(jax.random.PRNGKey(0), toks)
    full = eval_model.apply(variables, toks)
    path = str(tmp_path / "ck")
    save_checkpoint(path, {"params": variables["params"]},
                    {"model": dict(cfg), "train": {}, "data": {}})
    dec = Decoder.from_checkpoint(path)
    _assert_close(np.asarray(full), np.asarray(dec.stepwise_logits(toks)))


def test_decode_mamba2_bf16_state():
    # bf16 state storage (opt-in serving knob): f32 update arithmetic keeps
    # the short-horizon drift small; parity is looser than the f32 default
    cfg = dict(_MB_BASE)
    _, eval_model, _ = build_models(dict(cfg), False)
    toks = _tokens()
    variables = eval_model.init(jax.random.PRNGKey(0), toks)
    full = np.asarray(eval_model.apply(variables, toks))
    dec = Decoder(cfg, variables["params"], state_dtype=jnp.bfloat16)
    stepwise = np.asarray(dec.stepwise_logits(toks))
    _assert_close(full, stepwise, rtol=5e-2, atol=5e-2)


def test_generate_on_serving_mesh():
    # batch-sharded serving: a 1-axis mesh over the 8 virtual devices emits
    # exactly the single-device tokens (per-example math is unchanged)
    from jax.sharding import Mesh

    cfg = {**_TF_BASE, "attention_fn": "lin-attention", "mixer": "glu"}
    _, eval_model, _ = build_models(dict(cfg), False)
    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, V, (8, 6)), jnp.int32)
    variables = eval_model.init(jax.random.PRNGKey(0), prompt)
    single = Decoder(cfg, variables["params"])
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    sharded = Decoder(cfg, variables["params"], mesh=mesh)
    out_s = np.asarray(single.generate(prompt, n_new=7))
    out_m = np.asarray(sharded.generate(prompt, n_new=7))
    assert np.array_equal(out_s, out_m)
    # sampled path on the mesh produces valid tokens too
    out = sharded.generate(prompt, n_new=5, temperature=1.0,
                           rng=jax.random.PRNGKey(1), top_k=8)
    assert out.shape == (8, 11)


# -------------------------------------------------- parallel (MXU) prefill

def _prefill_vs_stepwise(cfg, L0=11):
    """prefill's (cache, logits) must match running L0 stepwise steps."""
    _, eval_model, _ = build_models(dict(cfg), False)
    toks = _tokens()[:, :L0]
    variables = eval_model.init(jax.random.PRNGKey(0), _tokens())
    dec = Decoder(cfg, variables["params"],
                  batch_stats=variables.get("batch_stats"))
    cache_p, logits_p = dec.prefill(toks)
    cache_s = dec.init_cache(B, L0)
    for t in range(L0):
        cache_s, logits_s = dec.step(cache_s, toks[:, t], t)
    np.testing.assert_allclose(np.asarray(logits_p), np.asarray(logits_s),
                               rtol=2e-4, atol=2e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4),
        cache_p, cache_s,
    )
    # generate (which now uses the parallel prefill) still continues with
    # exactly the greedy token the stepwise path would emit
    out = dec.generate(toks, n_new=3)
    assert int(out[0, L0]) == int(np.argmax(np.asarray(logits_s)[0]))


def test_prefill_lru():
    _prefill_vs_stepwise({**_SSM_BASE, "layer": "lru"})


def test_prefill_s5_batchnorm():
    _prefill_vs_stepwise({**_SSM_BASE, "layer": "s5", "num_blocks": 2,
                          "norm": "batch", "C_init": "lecun_normal"})


def test_prefill_lin_attention_conv():
    _prefill_vs_stepwise({**_TF_BASE, "attention_fn": "lin-attention",
                          "dim_conv": 3, "conv_type": "full", "mixer": "glu"})


def test_prefill_sm_attention():
    # sm KV cache is sized max_len=L0 here; stepwise cache matches exactly
    _prefill_vs_stepwise({**_TF_BASE, "attention_fn": "sm-attention",
                          "mixer": "mlp", "use_gate": True})


def test_prefill_norm_attention_partial_conv():
    _prefill_vs_stepwise({**_TF_BASE, "attention_fn": "norm-attention",
                          "norm_fn": "softplus", "approx_fn": "elu",
                          "scale_B": True, "offset": True,
                          "offset_init": "uniform", "dim_conv": 3,
                          "conv_type": "qk", "mixer": "hybrid"})


def test_prefill_mamba2_ngroups():
    _prefill_vs_stepwise({**_MB_BASE, "ngroups": 2,
                          "learnable_init_states": True})


def test_prefill_mamba2_pseudo_lti():
    _prefill_vs_stepwise({**_MB_BASE, "pseudoLTI": True})


def test_prefill_mamba1():
    _prefill_vs_stepwise({**_MB_BASE, "version": "mamba1", "expansion": 2})


def test_prefill_short_prompt_conv_pad():
    # prompt shorter than the conv window: the tail buffer front-pads
    _prefill_vs_stepwise({**_TF_BASE, "attention_fn": "lin-attention",
                          "dim_conv": 3, "conv_type": "full",
                          "mixer": "none"}, L0=1)
