"""Training-layer unit tests: schedules, plateau decay, LR injection,
optimizer grouping — parity with the reference formulas."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tlie_tpu.training.schedules import (
    PlateauState,
    constant_lr,
    cosine_annealing,
    linear_warmup,
    reduce_lr_on_plateau,
    schedule_for_step,
)
from tlie_tpu.training.scan_loop import _traced_lr, batch_indices, eval_indices
from tlie_tpu.training.state import map_nested_fn, set_group_learning_rates
from tlie_tpu.training.steps import compute_accuracy, cross_entropy_loss


def test_schedule_formulas_match_reference():
    """Formulas at jax_helpers/train_helpers.py:16-29."""
    assert linear_warmup(9, 1.0, 100) == pytest.approx(0.1)
    # cosine: (base−min)·0.5(1+cos(π·t/T)) + min
    v = cosine_annealing(50, 1.0, 100, lr_min=1e-6)
    assert v == pytest.approx((1.0 - 1e-6) * 0.5 + 1e-6, rel=1e-5)
    assert float(cosine_annealing(100, 1.0, 100, 1e-6)) == pytest.approx(1e-6, abs=1e-8)
    assert constant_lr(123, 0.3, None) == 0.3


def test_traced_lr_matches_host_schedule():
    """The in-graph schedule used by scanned blocks must equal the host one."""
    for step in (0, 5, 49, 50, 120, 400):
        host = schedule_for_step(step, 50, 400, True, 0.01, 0.001, 1e-6)
        traced = (
            float(_traced_lr(jnp.asarray(step), 0.01, 50, 400, True, 1e-6)),
            float(_traced_lr(jnp.asarray(step), 0.001, 50, 400, True, 1e-6)),
        )
        np.testing.assert_allclose(traced, host, rtol=1e-6)


def test_reduce_lr_on_plateau_reference_semantics():
    """ref jax_helpers/train_helpers.py:50-68."""
    st = PlateauState(1.0, 0.1, 0, -np.inf)
    st = reduce_lr_on_plateau(st, 0.5, factor=0.5, patience=2, lr_min=1e-3)
    assert st.best == 0.5 and st.count == 0 and st.lr == 1.0
    for _ in range(2):
        st = reduce_lr_on_plateau(st, 0.4, factor=0.5, patience=2, lr_min=1e-3)
    assert st.count == 2 and st.lr == 1.0
    st = reduce_lr_on_plateau(st, 0.4, factor=0.5, patience=2, lr_min=1e-3)
    assert st.lr == 0.5 and st.ssm_lr == 0.05 and st.count == 0
    # floor
    for _ in range(50):
        st = reduce_lr_on_plateau(st, 0.0, factor=0.5, patience=0, lr_min=1e-3)
    assert st.lr >= 1e-3 and st.ssm_lr >= 1e-3


def test_set_group_learning_rates_functional():
    params = {"a": {"Lambda_re": jnp.ones(3)}, "b": {"kernel": jnp.ones((2, 2))}}
    tx = optax.multi_transform(
        {
            "ssm": optax.inject_hyperparams(optax.adam)(learning_rate=0.1),
            "regular": optax.inject_hyperparams(optax.adamw)(learning_rate=0.2),
        },
        map_nested_fn(lambda k, _: "ssm" if k == "Lambda_re" else "regular"),
    )
    opt_state = tx.init(params)
    new_state = set_group_learning_rates(
        opt_state, {"ssm": 0.5, "regular": 0.7}
    )

    def get_lr(st, name):
        inner = st.inner_states[name]
        while not (hasattr(inner, "hyperparams") and "learning_rate" in getattr(inner, "hyperparams", {})):
            if hasattr(inner, "inner_state"):
                inner = inner.inner_state
            elif isinstance(inner, tuple):
                inner = inner[0]
            else:
                raise AssertionError("no hyperparams found")
        return float(inner.hyperparams["learning_rate"])

    assert get_lr(new_state, "ssm") == pytest.approx(0.5)
    assert get_lr(new_state, "regular") == pytest.approx(0.7)
    # original untouched (functional)
    assert get_lr(opt_state, "ssm") == pytest.approx(0.1)


def test_cross_entropy_ignores_minus_100():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 5, 7), jnp.float32)
    labels = jnp.asarray([[1, 2, -100, 3, -100], [-100, -100, 0, 4, 6]])
    loss = float(cross_entropy_loss(logits, labels))
    # manual masked mean in float64
    logp = np.log(np.exp(np.float64(logits)) / np.exp(np.float64(logits)).sum(-1, keepdims=True))
    vals = []
    for b in range(2):
        for t in range(5):
            y = int(labels[b, t])
            if y != -100:
                vals.append(-logp[b, t, y])
    assert loss == pytest.approx(np.mean(vals), rel=1e-4)
    acc = compute_accuracy(logits, labels)
    assert 0.0 <= float(acc) <= 1.0


def test_batch_indices_cover_epochs_without_replacement():
    rng = np.random.default_rng(0)
    idx = batch_indices(rng, n=40, batch_size=10, k_steps=8)
    assert idx.shape == (8, 10)
    # first epoch (4 batches) covers all 40 examples exactly once
    first_epoch = idx[:4].reshape(-1)
    assert sorted(first_epoch.tolist()) == list(range(40))
    ev = eval_indices(25, 10)
    assert ev.shape == (2, 10)


def test_scan_mode_matches_per_step_loop(tmp_path):
    """The scanned-block trainer and the per-step fallback must produce the
    same learning trajectory (same data order, same LR schedule) up to
    dropout-stream differences — here dropout is 0 so trajectories align."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    def run(scan: bool, tag: str):
        raw = {
            "seed": 3,
            "save": str(tmp_path / f"ck-{tag}"),
            "dataset": {
                "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
                "num_kv_pairs": 4, "vocab_size": 64,
                "num_train_examples": 128, "num_test_examples": 64,
                "fixed_size": True,
            },
            "train": {
                "total_steps": 12, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
                "eval_every": 6, "cosine_anneal": True, "param_group": None,
                "scan_blocks": scan,
            },
            "model": {
                "input_dim": 1, "output_dim": 64, "layer": "transformer",
                "attention_fn": "lin-attention", "use_flash": False,
                "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
                "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
                "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
                "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
                "classifier": False, "pooling": "mean", "dual": False,
            },
        }
        cfg = ExperimentConfig(raw).validate()
        ds = SequenceDataset.registry["mqar"](**cfg.dataset)
        ds.setup()
        cfg.derive_runtime_fields(ds)
        tl = ds.train_dataloader(batch_size=16, shuffle=True)
        el = ds.test_dataloader(batch_size=16, shuffle=False)
        return train(cfg, tl, el, ds.get_metrics(), None)

    _, perf_scan = run(True, "scan")
    _, perf_step = run(False, "step")
    # different data-order RNGs → not bit-equal, but both must have learned
    # comparably from identical schedules on the same tiny task
    assert abs(perf_scan - perf_step) < 0.15


def test_data_parallel_matches_single_device(tmp_path):
    """The batch-sharded data-parallel path (8 virtual devices, params
    replicated, gradient all-reduce inserted by XLA) must reproduce the
    single-device trajectory — identical data order, schedules, and dropout
    stream, so only reduction-order float noise separates them."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    import jax

    assert jax.device_count() >= 8, "conftest must provision 8 virtual devices"

    def run(data_parallel: bool, tag: str):
        raw = {
            "seed": 5,
            "save": str(tmp_path / f"dp-{tag}"),
            "dataset": {
                "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
                "num_kv_pairs": 4, "vocab_size": 64,
                "num_train_examples": 128, "num_test_examples": 64,
                "fixed_size": True,
            },
            "train": {
                "total_steps": 10, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
                "eval_every": 5, "cosine_anneal": True, "param_group": None,
                "data_parallel": data_parallel,
            },
            "model": {
                "input_dim": 1, "output_dim": 64, "layer": "transformer",
                "attention_fn": "lin-attention", "use_flash": False,
                "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
                "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
                "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
                "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
                "classifier": False, "pooling": "mean", "dual": False,
            },
        }
        cfg = ExperimentConfig(raw).validate()
        ds = SequenceDataset.registry["mqar"](**cfg.dataset)
        ds.setup()
        cfg.derive_runtime_fields(ds)
        tl = ds.train_dataloader(batch_size=16, shuffle=True)
        el = ds.test_dataloader(batch_size=16, shuffle=False)
        return train(cfg, tl, el, ds.get_metrics(), None)

    _, perf_dp = run(True, "on")
    _, perf_single = run(False, "off")
    assert perf_dp == pytest.approx(perf_single, abs=5e-3)


def test_vocab_tensor_parallel_matches_single_device(tmp_path):
    """train.model_parallel=2 shards the token embedding + LM-head vocab
    axis over a (data=4, model=2) mesh (parallel/tp.py); GSPMD inserts the
    cross-shard collectives for the embedding gather and the CE logsumexp.
    Must reproduce the single-device trajectory up to reduction-order noise,
    and the sharded state must actually be placed vocab-split."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import train

    import jax

    assert jax.device_count() >= 8, "conftest must provision 8 virtual devices"

    def run(model_parallel: int, tag: str):
        raw = {
            "seed": 5,
            "save": str(tmp_path / f"tp-{tag}"),
            "dataset": {
                "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
                "num_kv_pairs": 4, "vocab_size": 64,
                "num_train_examples": 128, "num_test_examples": 64,
                "fixed_size": True,
            },
            "train": {
                "total_steps": 10, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
                "eval_every": 5, "cosine_anneal": True, "param_group": None,
                "data_parallel": model_parallel > 1,
                "model_parallel": model_parallel,
            },
            "model": {
                "input_dim": 1, "output_dim": 64, "layer": "transformer",
                "attention_fn": "lin-attention", "use_flash": False,
                "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
                "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
                "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
                "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
                "classifier": False, "pooling": "mean", "dual": False,
            },
        }
        cfg = ExperimentConfig(raw).validate()
        ds = SequenceDataset.registry["mqar"](**cfg.dataset)
        ds.setup()
        cfg.derive_runtime_fields(ds)
        tl = ds.train_dataloader(batch_size=16, shuffle=True)
        el = ds.test_dataloader(batch_size=16, shuffle=False)
        return train(cfg, tl, el, ds.get_metrics(), None)

    _, perf_tp = run(2, "mp2")
    _, perf_single = run(1, "single")
    assert perf_tp == pytest.approx(perf_single, abs=5e-3)


def test_vocab_partition_specs_rules():
    """Path rules pick out exactly the vocab-bearing leaves, uniformly for a
    bare param tree and for structures that mirror it (optimizer moments)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tlie_tpu.parallel.tp import vocab_partition_specs

    params = {
        "params": {
            "encoder": {"word_embeddings": {"embedding": jnp.zeros((64, 16))}},
            "decoder": {"kernel": jnp.zeros((16, 64)), "bias": jnp.zeros((64,))},
            "layers_0": {"attention": {"Wqkv": {"kernel": jnp.zeros((16, 48))}}},
        }
    }
    params["params"]["layers_0"]["mixer"] = {
        # per-block MLP/LAMBDA mixers have their own small "decoder" Dense
        # (models/layers.py) — they must stay replicated, not vocab-sharded
        "decoder": {"kernel": jnp.zeros((16, 16)), "bias": jnp.zeros((16,))}
    }
    params["params"]["match"] = {
        "decoder": {"kernel": jnp.zeros((16, 2)), "bias": jnp.zeros((2,))}
    }
    params["params"]["classifier"] = {
        "decoder": {"kernel": jnp.zeros((16, 10)), "bias": jnp.zeros((10,))}
    }
    specs = vocab_partition_specs(params)["params"]
    assert specs["encoder"]["word_embeddings"]["embedding"] == P("model", None)
    assert specs["decoder"]["kernel"] == P(None, "model")
    assert specs["decoder"]["bias"] == P("model")
    assert specs["layers_0"]["attention"]["Wqkv"]["kernel"] == P()
    # anchored rules: only the MODEL-level decoder is the vocab head
    assert specs["layers_0"]["mixer"]["decoder"]["kernel"] == P()
    assert specs["layers_0"]["mixer"]["decoder"]["bias"] == P()
    assert specs["match"]["decoder"]["kernel"] == P()
    assert specs["classifier"]["decoder"]["bias"] == P()

    # the placement is real: each model-axis shard holds vocab/2 rows
    from tlie_tpu.parallel.tp import mesh_2d, shard_vocab_parallel

    sharded = shard_vocab_parallel(params, mesh_2d(2))
    emb = sharded["params"]["encoder"]["word_embeddings"]["embedding"]
    shard_shapes = {s.data.shape for s in emb.addressable_shards}
    assert shard_shapes == {(32, 16)}
    wqkv = sharded["params"]["layers_0"]["attention"]["Wqkv"]["kernel"]
    assert {s.data.shape for s in wqkv.addressable_shards} == {(16, 48)}


def test_step_resume_matches_uninterrupted_run(tmp_path):
    """Mid-training snapshot + resume reproduces the uninterrupted run
    exactly: step counter, LR-schedule position, rng stream and host
    batch-index stream all continue from the snapshot, so the final perf is
    bit-identical. Also checks completed runs clean their snapshot up."""
    import os
    import shutil

    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training import loop as loop_mod
    from tlie_tpu.training import train

    def make_cfg(resume=False):
        raw = {
            "seed": 11,
            "save": str(tmp_path / "rs"),
            "dataset": {
                "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
                "num_kv_pairs": 4, "vocab_size": 64,
                "num_train_examples": 128, "num_test_examples": 64,
                "fixed_size": True,
            },
            "train": {
                "total_steps": 16, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
                "eval_every": 4, "cosine_anneal": True, "param_group": None,
                "checkpoint_every": 4, **({"resume": True} if resume else {}),
            },
            "model": {
                "input_dim": 1, "output_dim": 64, "layer": "transformer",
                "attention_fn": "lin-attention", "use_flash": False,
                "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
                "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
                "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
                "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
                "classifier": False, "pooling": "mean", "dual": False,
            },
        }
        return ExperimentConfig(raw).validate()

    ds = SequenceDataset.registry["mqar"](**make_cfg().dataset)
    ds.setup()
    tl = ds.train_dataloader(batch_size=16, shuffle=True)
    el = ds.test_dataloader(batch_size=16, shuffle=False)

    def run(cfg):
        cfg.derive_runtime_fields(ds)
        return train(cfg, tl, el, ds.get_metrics(), None)

    # Uninterrupted 16-step run, keeping a copy of the step-8 snapshot (the
    # state a preempted job would find on disk).
    snap_at_8 = {}
    orig_save = loop_mod.save_resume

    def capture(path, state, meta):
        out = orig_save(path, state, meta)
        if int(meta["step"]) == 8:
            snap_at_8["dir"] = shutil.copytree(out, out + "-at8")
        return out

    loop_mod.save_resume = capture
    try:
        _, perf_full = run(make_cfg())
    finally:
        loop_mod.save_resume = orig_save
    assert "dir" in snap_at_8, "no snapshot written at step 8"

    resume_dir = make_cfg().checkpoint_name() + "-resume"
    assert not os.path.isdir(resume_dir)  # completed run cleaned up

    # "Preempted" job: put the step-8 snapshot in place and resume to 16.
    shutil.copytree(snap_at_8["dir"], resume_dir)
    _, perf_resumed = run(make_cfg(resume=True))

    assert perf_resumed == pytest.approx(perf_full, abs=1e-6)


def test_fused_bf16_head_block_matches_xla_loss():
    """The fused decoder+CE head with bf16 MXU operands (the production
    perf configuration, ops/fused_xent.py via scan_loop fused_head) must
    track the XLA materialised-logits block's loss trajectory to bf16
    rounding on the same data order."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.models.registry import build_models
    from tlie_tpu.training.loop import _make_state
    from tlie_tpu.training.scan_loop import (batch_indices, make_train_block,
                                             put_dataset)

    raw = {
        "seed": 5, "save": None,
        "dataset": {
            "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
            "num_kv_pairs": 4, "vocab_size": 64,
            "num_train_examples": 128, "num_test_examples": 64,
            "fixed_size": True,
        },
        "train": {
            "total_steps": 8, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
            "eval_every": 100, "cosine_anneal": True, "param_group": None,
        },
        "model": {
            "input_dim": 1, "output_dim": 64, "layer": "transformer",
            "attention_fn": "lin-attention", "use_flash": False,
            "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
            "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
            "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
            "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
            "classifier": False, "pooling": "mean", "dual": False,
        },
    }
    cfg = ExperimentConfig(raw).validate()
    ds = SequenceDataset.registry["mqar"](**cfg.dataset)
    ds.setup()
    cfg.derive_runtime_fields(ds)
    data = put_dataset(ds.train_inputs, ds.train_labels)
    model, _, _ = build_models(cfg.model, False)
    idx = batch_indices(np.random.default_rng(0), len(ds.train_inputs), 16, 8)

    from jax.experimental.pallas import tpu as pltpu

    losses = {}
    for fused in (False, True):
        state, _, rng = _make_state(cfg, model, integer_inputs=True)
        block = make_train_block(
            model, "layer", ("regular",), warmup=0, total_steps=100,
            cosine=True, lr_min=1e-6, fused_head=fused,
            fused_head_dtype="bfloat16" if fused else None,
        )
        with pltpu.force_tpu_interpret_mode():
            _, loss = block(state, rng, data, jnp.asarray(idx), 0, 3e-3, 3e-3)
        losses[fused] = float(loss)
    assert np.isfinite(losses[True])
    assert abs(losses[True] - losses[False]) < 0.05 * abs(losses[False]) + 0.02


def _mqar_raw(layer_cfg):
    raw = {
        "seed": 5, "save": None,
        "dataset": {
            "name": "MQAR", "_name_": "mqar", "input_seq_length": 32,
            "num_kv_pairs": 4, "vocab_size": 64,
            "num_train_examples": 128, "num_test_examples": 64,
            "fixed_size": True,
        },
        "train": {
            "total_steps": 8, "batch_size": 16, "lr": 3e-3, "wd": 0.1,
            "eval_every": 100, "cosine_anneal": True, "param_group": None,
        },
        "model": layer_cfg,
    }
    return raw


_LIN_MODEL = {
    "input_dim": 1, "output_dim": 64, "layer": "transformer",
    "attention_fn": "lin-attention", "use_flash": False,
    "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
    "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
    "embedding": True, "vocab_size": 64, "max_pos_embed": 32,
    "mixer": "none", "mixer_dim": 16, "dropout": 0.0,
    "classifier": False, "pooling": "mean", "dual": False,
}

_LRU_MODEL = {
    "input_dim": 64, "output_dim": 64, "layer": "lru",
    "num_layers": 1, "hidden_dim": 16, "state_dim": 16,
    "norm": "batch", "prenorm": False, "activation": "half_glu1",
    "dropout": 0.0, "pooling": "none", "embedding": False,
    "r_min": 0.9, "r_max": 0.999, "max_phase": 6.28,
}


@pytest.mark.parametrize("family", ["lin", "lru"])
def test_sparse_head_matches_dense(family):
    """Sparse decoder head (gather valid label positions before the decoder
    matmul) must give the identical loss AND identical trained params as the
    dense head — masked (-100) positions have exactly zero logit-gradient."""
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.models.registry import build_models
    from tlie_tpu.training.loop import _make_state
    from tlie_tpu.training.scan_loop import (batch_indices, make_train_block,
                                             put_dataset)

    model_cfg = dict(_LIN_MODEL if family == "lin" else _LRU_MODEL)
    cfg = ExperimentConfig(_mqar_raw(model_cfg)).validate()
    ds = SequenceDataset.registry["mqar"](**cfg.dataset)
    ds.setup()
    cfg.derive_runtime_fields(ds)
    labels = np.asarray(ds.train_labels).copy()
    # vary the valid count: strip one valid label from a third of the rows so
    # K (the dataset max) exceeds some rows' counts — the top_k fallback
    # positions then carry -100 labels and must stay masked
    for i in range(0, len(labels), 3):
        (vp,) = np.nonzero(labels[i] != -100)
        labels[i, vp[0]] = -100
    k = int((labels != -100).sum(axis=1).max())
    assert k == 4
    data = put_dataset(ds.train_inputs, labels)
    model, _, _ = build_models(cfg.model, False)
    norm = "batch" if family == "lru" else "layer"
    idx = batch_indices(np.random.default_rng(0), len(ds.train_inputs), 16, 8)

    outs = {}
    for sparse in (None, k):
        state, _, rng = _make_state(cfg, model, integer_inputs=(family == "lin"))
        block = make_train_block(
            model, norm, ("regular",), warmup=0, total_steps=100,
            cosine=True, lr_min=1e-6, sparse_head_k=sparse,
        )
        state, loss = block(state, rng, data, jnp.asarray(idx), 0, 3e-3, 3e-3)
        outs[sparse] = (state, float(loss))

    (sd, ld), (ss, ls) = outs[None], outs[k]
    assert np.isfinite(ls)
    assert abs(ls - ld) < 1e-5 + 1e-5 * abs(ld)

    # eval block: CE and masked accuracy reduce over exactly the valid
    # positions, so the sparse-head eval must be the identical number
    from tlie_tpu.training.scan_loop import eval_indices, make_eval_block
    from tlie_tpu.training.steps import compute_accuracy as acc_fn

    _, eval_model, _ = build_models(cfg.model, False)
    eidx = jnp.asarray(eval_indices(len(ds.train_inputs), 16)[:2])
    ev_d = make_eval_block(eval_model, norm, acc_fn)
    ev_s = make_eval_block(eval_model, norm, acc_fn, sparse_head_k=k)
    ld_e, md_e = ev_d(sd, data, eidx)
    ls_e, ms_e = ev_s(sd, data, eidx)
    np.testing.assert_allclose(float(ls_e), float(ld_e), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(ms_e), float(md_e), rtol=1e-6, atol=1e-7)
    flat_d = jax.tree_util.tree_leaves(sd.params)
    flat_s = jax.tree_util.tree_leaves(ss.params)
    for a, b in zip(flat_d, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    if norm == "batch":
        for a, b in zip(jax.tree_util.tree_leaves(sd.batch_stats),
                        jax.tree_util.tree_leaves(ss.batch_stats)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_sparse_k_gating():
    """sparse_head_k_for — the ONE gating helper shared by the training
    loop, the mesh sweep and bench: K = max valid count over train ∪ test,
    enabled only for per-position decoders with 2-D ≥4×-sparse labels."""
    from tlie_tpu.training.scan_loop import sparse_head_k_for

    per_pos_cfg = {"layer": "transformer", "classifier": False, "dual": False}

    lab = np.full((10, 32), -100, np.int64)
    lab[:, :4] = 7
    lab[3, 4] = 1  # one row with 5 valid → K must be 5
    assert sparse_head_k_for(per_pos_cfg, lab) == 5

    # a TEST row denser than the train max must raise K — eval gathers
    # top-K positions from test labels (round-4 advisor finding: K from the
    # train split alone silently dropped the extra valid positions)
    te = np.full((6, 32), -100, np.int64)
    te[:, :7] = 2
    assert sparse_head_k_for(per_pos_cfg, lab, te) == 7

    # mismatched seq lengths across splits → disabled (can't share one K)
    te_short = np.full((6, 16), -100, np.int64)
    assert sparse_head_k_for(per_pos_cfg, lab, te_short) is None

    # fully dense → disabled
    assert sparse_head_k_for(per_pos_cfg, np.zeros((10, 32), np.int64)) is None

    # classification labels → disabled
    assert sparse_head_k_for(per_pos_cfg, np.zeros((10,), np.int64)) is None

    # 5 of 16 valid → 5*4 > 16 → not sparse enough
    lab = np.full((4, 16), -100, np.int64)
    lab[:, :5] = 1
    assert sparse_head_k_for(per_pos_cfg, lab) is None

    # pooled / classifier / dual models are never per-position
    assert sparse_head_k_for({"layer": "transformer", "classifier": True}, lab) is None
    assert sparse_head_k_for({"layer": "mamba", "pooling": "mean"}, lab) is None
    assert sparse_head_k_for(
        {"layer": "transformer", "dual": True}, lab
    ) is None

    # bench's env-gated wrapper delegates to the same helper
    import importlib.util as iu
    spec = iu.spec_from_file_location("bench", "bench.py")
    bench = iu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    class DS:
        pass

    ds = DS()
    lab = np.full((10, 32), -100, np.int64)
    lab[:, :4] = 7
    ds.train_labels = lab
    ds.test_labels = lab
    assert bench._sparse_k(per_pos_cfg, ds) == 4
