"""Sequence parallelism: cross-device scan ≡ single-device scan.

The SP decomposition (parallel/sp.py) must be exact up to float
reassociation: each device scans its time shard, carries travel once over
the mesh, and the fixed-up result matches ``ops.scan.diag_linear_scan``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tlie_tpu.ops.scan import diag_linear_scan
from tlie_tpu.parallel.sp import seq_mesh, sp_diag_linear_scan


def _rand_pair(rng, shape, scale=1.0):
    return (
        jnp.asarray(rng.normal(size=shape) * scale, jnp.float32),
        jnp.asarray(rng.normal(size=shape) * scale, jnp.float32),
    )


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must provision 8 virtual devices"
    return seq_mesh(8)


def test_sp_real_matches_single_device(mesh):
    rng = np.random.default_rng(0)
    B, L, N = 2, 64, 16
    # stable decays in (0, 1): the LRU/S5 regime
    a = jnp.asarray(rng.uniform(0.7, 0.999, size=(B, L, N)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(B, L, N)), jnp.float32)

    ref = diag_linear_scan(a, b, impl="scan")
    got = jax.jit(lambda a, b: sp_diag_linear_scan(a, b, mesh))(a, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_sp_pair_complex_matches_single_device(mesh):
    rng = np.random.default_rng(1)
    B, L, N = 2, 64, 8
    # complex decay on the stable ring, as the LRU λ parameterisation
    r = rng.uniform(0.8, 0.99, size=(B, L, N))
    th = rng.uniform(0, 2 * np.pi, size=(B, L, N))
    a = (jnp.asarray(r * np.cos(th), jnp.float32), jnp.asarray(r * np.sin(th), jnp.float32))
    b = _rand_pair(rng, (B, L, N))

    ref_re, ref_im = diag_linear_scan(a, b, impl="scan")
    got_re, got_im = jax.jit(lambda ar, ai, br, bi: sp_diag_linear_scan((ar, ai), (br, bi), mesh))(
        a[0], a[1], b[0], b[1]
    )
    np.testing.assert_allclose(np.asarray(got_re), np.asarray(ref_re), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_im), np.asarray(ref_im), atol=1e-5, rtol=1e-5)


def test_sp_output_is_sequence_sharded(mesh):
    """The result stays sharded over the seq axis — downstream seq-sharded
    ops consume it without a gather."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.uniform(0.5, 0.9, size=(1, 32, 4)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(1, 32, 4)), jnp.float32)
    out = jax.jit(lambda a, b: sp_diag_linear_scan(a, b, mesh))(a, b)
    shard_lens = {s.data.shape[1] for s in out.addressable_shards}
    assert shard_lens == {32 // 8}


def test_sp_rejects_indivisible_length(mesh):
    a = jnp.ones((1, 30, 4))
    with pytest.raises(ValueError, match="not divisible"):
        sp_diag_linear_scan(a, a, mesh)


def test_ring_attention_matches_single_device(mesh):
    """Ring attention over the seq-sharded mesh ≡ the XLA causal-attention
    oracle: the online-softmax accumulation across rotating KV blocks is
    algebraically exact."""
    from tlie_tpu.ops.attention import causal_softmax_attention
    from tlie_tpu.parallel.ring import ring_causal_attention

    rng = np.random.default_rng(7)
    B, L, H, D = 2, 64, 2, 8
    q = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)

    ref = causal_softmax_attention(q, k, v, scale=0.25, impl="xla")
    got = jax.jit(lambda q, k, v: ring_causal_attention(q, k, v, mesh, scale=0.25))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5)
    # output stays sequence-sharded
    assert {s.data.shape[1] for s in got.addressable_shards} == {L // 8}


def test_ring_attention_rejects_indivisible_length(mesh):
    from tlie_tpu.parallel.ring import ring_causal_attention

    q = jnp.ones((1, 30, 2, 8))
    with pytest.raises(ValueError, match="not divisible"):
        ring_causal_attention(q, q, q, mesh)


def test_sp_linear_attention_matches_single_device(mesh):
    """Cross-device linear attention: per-shard chunked kernels + one
    all-gather of KV-state summaries ≡ the single-device kernel."""
    from tlie_tpu.ops.linear_attention import chunked_linear_attention
    from tlie_tpu.parallel.sp import sp_linear_attention

    rng = np.random.default_rng(9)
    B, L, H, D = 2, 64, 2, 8
    q = jax.nn.elu(jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)) + 1
    k = jax.nn.elu(jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)) + 1
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)

    ref = chunked_linear_attention(q, k, v, scale=0.5)
    got = jax.jit(lambda q, k, v: sp_linear_attention(q, k, v, mesh, scale=0.5))(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=2e-4)
    assert {s.data.shape[1] for s in got.addressable_shards} == {L // 8}


def test_sp_primitives_differentiable(mesh):
    """Gradients flow through the cross-device primitives (fori_loop +
    ppermute / all_gather transpose) and match the single-device oracles —
    the SP paths are trainable, not inference-only."""
    from tlie_tpu.ops.attention import causal_softmax_attention
    from tlie_tpu.ops.linear_attention import chunked_linear_attention
    from tlie_tpu.parallel.ring import ring_causal_attention
    from tlie_tpu.parallel.sp import sp_linear_attention

    rng = np.random.default_rng(11)
    B, L, H, D = 1, 32, 2, 4
    q, k, v = (jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32) for _ in range(3))

    pairs = [
        (lambda q, k, v: ring_causal_attention(q, k, v, mesh, scale=0.5),
         lambda q, k, v: causal_softmax_attention(q, k, v, scale=0.5, impl="xla")),
        (lambda q, k, v: sp_linear_attention(q, k, v, mesh, scale=0.5),
         lambda q, k, v: chunked_linear_attention(q, k, v, scale=0.5)),
    ]
    for sp_fn, ref_fn in pairs:
        g_sp = jax.jit(jax.grad(lambda *a: jnp.sum(sp_fn(*a) ** 2), argnums=(0, 1, 2)))(q, k, v)
        g_ref = jax.grad(lambda *a: jnp.sum(ref_fn(*a) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, r in zip(g_sp, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4, rtol=1e-4)

    # the diagonal scan too (real mode)
    a_dec = jnp.asarray(rng.uniform(0.7, 0.99, size=(B, L, D)), jnp.float32)
    b_in = jnp.asarray(rng.normal(size=(B, L, D)), jnp.float32)
    from tlie_tpu.ops.scan import diag_linear_scan
    from tlie_tpu.parallel.sp import sp_diag_linear_scan

    g_sp = jax.jit(jax.grad(lambda a, b: jnp.sum(sp_diag_linear_scan(a, b, mesh) ** 2), argnums=(0, 1)))(a_dec, b_in)
    g_ref = jax.grad(lambda a, b: jnp.sum(diag_linear_scan(a, b, impl="scan") ** 2), argnums=(0, 1))(a_dec, b_in)
    for a, r in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-4, rtol=1e-4)


def test_sp_reverse_matches_single_device(mesh):
    """reverse=True (bidirectional S5) over the mesh ≡ single-device."""
    rng = np.random.default_rng(5)
    B, L, N = 2, 64, 8
    a = _rand_pair(rng, (B, L, N), scale=0.4)
    b = _rand_pair(rng, (B, L, N))
    got = jax.jit(
        lambda a, b: sp_diag_linear_scan(a, b, mesh, axis=-2, reverse=True)
    )(a, b)
    want = diag_linear_scan(a, b, axis=-2, reverse=True, impl="assoc")
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("layer", ["lru", "s5"])
def test_sequence_parallel_training_matches_single_device(layer, tmp_path):
    """The config knob (`train.sequence_parallel: N`) end-to-end: an
    LRU / S5 model trained with its recurrence time-sharded over 4 devices
    must match the single-device run — same final perf, near-identical
    final params (VERDICT r4 item 6: capability, not just library fns)."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    def _cfg(sp):
        extra_model = {
            "lru": {
                "layer": "lru", "r_min": 0.9, "r_max": 0.99,
                "activation": "full_glu",
                "ssm_lr_vars": ["Lambda_re", "Lambda_im", "P", "B", "log_step"],
            },
            "s5": {
                "layer": "s5", "activation": "half_glu1",
                "C_init": "lecun_normal", "discretization": "zoh",
                "conj_sym": True, "num_blocks": 4, "bidirectional": True,
                "ssm_lr_vars": ["Lambda_re", "Lambda_im", "B", "log_step"],
            },
        }[layer]
        raw = {
            "seed": 11, "save": None,
            "dataset": {
                "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
                "num_kv_pairs": 4, "vocab_size": 64,
                "num_train_examples": 128, "num_test_examples": 32,
                "fixed_size": True,
            },
            "train": {
                "total_steps": 8, "batch_size": 16, "lr": 3e-3, "wd": 0.05,
                "ssm_lr": 1e-3, "eval_every": 8, "cosine_anneal": True,
                "param_group": None, "data_parallel": False,
                "sequence_parallel": sp,
            },
            "model": {
                "dt_min": 0.001, "dt_max": 0.1, "num_layers": 2,
                "input_dim": 64, "output_dim": 64, "hidden_dim": 16,
                "state_dim": 16, "dropout": 0.0, "norm": "layer",
                "pooling": "none", "prenorm": False, "dual": False,
                "decode": False, **extra_model,
            },
        }
        return ExperimentConfig(raw).validate()

    cfg = _cfg(1)
    ds = SequenceDataset.registry["mqar"](**cfg.dataset)
    ds.setup()
    metrics_fn = ds.get_metrics(layer=layer)
    tl = ds.train_dataloader(batch_size=16, shuffle=True)
    el = ds.test_dataloader(batch_size=16, shuffle=False)

    outs = {}
    for sp in (1, 4):
        c = _cfg(sp)
        c.derive_runtime_fields(ds)
        res = train(c, tl, el, metrics_fn)
        outs[sp] = (res[1], jax.device_get(res.state.params))

    assert abs(outs[1][0] - outs[4][0]) < 2e-3
    flat1 = jax.tree_util.tree_leaves(outs[1][1])
    flat4 = jax.tree_util.tree_leaves(outs[4][1])
    for x, y in zip(flat1, flat4):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-3, atol=1e-4
        )


def test_sp_linear_attention_normalizer_matches_single_device(mesh):
    """The cross-shard fused normalizer (q_t · Σ_{s≤t} k_s with the
    per-shard carry) ≡ the single-device fused normalizer."""
    from tlie_tpu.ops.linear_attention import chunked_linear_attention
    from tlie_tpu.parallel.sp import sp_linear_attention

    rng = np.random.default_rng(9)
    B, L, H, D = 2, 64, 2, 8
    q = jnp.asarray(np.abs(rng.normal(size=(B, L, H, D))), jnp.float32)
    k = jnp.asarray(np.abs(rng.normal(size=(B, L, H, D))), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, L, H, D)), jnp.float32)
    got_y, got_n = jax.jit(
        lambda q, k, v: sp_linear_attention(
            q, k, v, mesh, scale=0.5, return_normalizer=True
        )
    )(q, k, v)
    want_y, want_n = chunked_linear_attention(
        q, k, v, scale=0.5, return_normalizer=True
    )
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(want_n), rtol=2e-5, atol=2e-5)


@pytest.mark.slow
@pytest.mark.parametrize("attention_fn", ["lin-attention", "sm-attention", "norm-attention"])
def test_sequence_parallel_attention_training_matches_single_device(attention_fn, tmp_path):
    """train.sequence_parallel routes the transformer's attention through
    the seq mesh (lin/norm → sp_linear_attention incl. the fused
    normalizer; sm → ring attention) with single-device-equivalent
    results."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    extra = {}
    if attention_fn == "norm-attention":
        extra = {
            "mode": "attention", "norm_fn": "softplus", "approx_fn": "elu",
            "scale_B": True, "offset": True, "offset_init": "exp",
            "learn_A": False, "dim_conv": 4,
        }

    def _cfg(sp):
        raw = {
            "seed": 5, "save": None,
            "dataset": {
                "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
                "num_kv_pairs": 4, "vocab_size": 64,
                "num_train_examples": 128, "num_test_examples": 32,
                "fixed_size": True,
            },
            "train": {
                "total_steps": 6, "batch_size": 16, "lr": 3e-3, "wd": 0.05,
                "eval_every": 6, "cosine_anneal": True, "param_group": None,
                "data_parallel": False, "sequence_parallel": sp,
            },
            "model": {
                "input_dim": 1, "output_dim": 64, "layer": "transformer",
                "attention_fn": attention_fn, "use_flash": False,
                "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
                "num_heads": 2, "att_dropout": 0.0, "norm": "layer",
                "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
                "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
                "classifier": False, "pooling": "mean", "dual": False,
                **extra,
            },
        }
        return ExperimentConfig(raw).validate()

    cfg = _cfg(1)
    ds = SequenceDataset.registry["mqar"](**cfg.dataset)
    ds.setup()
    metrics_fn = ds.get_metrics(layer="transformer")
    tl = ds.train_dataloader(batch_size=16, shuffle=True)
    el = ds.test_dataloader(batch_size=16, shuffle=False)

    outs = {}
    for sp in (1, 4):
        c = _cfg(sp)
        c.derive_runtime_fields(ds)
        res = train(c, tl, el, metrics_fn)
        outs[sp] = (res[1], jax.device_get(res.state.params))

    assert abs(outs[1][0] - outs[4][0]) < 2e-3
    flat1 = jax.tree_util.tree_leaves(outs[1][1])
    flat4 = jax.tree_util.tree_leaves(outs[4][1])
    for x, y in zip(flat1, flat4):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=2e-3, atol=2e-4
        )
