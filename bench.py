"""Benchmark: training throughput + analysis latency on the reference budgets.

Prints ONE JSON line whose headline metric is the BASELINE.json primary
config (MQAR linear-attention steps/sec/chip); the ``extra`` field carries
the additional tracked metrics:

  * ``mqar_mamba2_train_steps_per_sec_per_chip`` — the hardest kernel (K1
    chunked SSD scan) at the full reference MQAR budget
    (ref configs/iclr2026/mqar/mqar-mamba2.yaml).
  * ``eval_eig_sec_per_checkpoint`` — the BASELINE.md analysis north star:
    full eigen-analysis pipeline wall-clock for one checkpoint at the
    reference's MQAR analysis batch size (64), including init+trained
    spectra, binning, and artifact writes.
  * ``wikitext_mamba2_train_steps_per_sec_per_chip`` and ``..._bf16_...`` —
    the LM-scale HBM-bound regime (61M params, block 1024, vocab 50257,
    batch 8 — ref configs/iclr2026/wikitext/wikitext-103-mamba2.yaml) in
    f32 and in the opt-in ``model.compute_dtype: bfloat16`` mode, guarding
    the mixed-precision path against regression.

``vs_baseline``: the reference publishes no throughput numbers
(BASELINE.md); we normalise against a conservative estimate of the
reference stack on its target GPU — 10 steps/s for this workload on a
single A100-class card (flash-linear-attention Triton path) — so
vs_baseline > 1.0 means faster than the reference-class setup.
"""

import json
import os
import shutil
import tempfile
import time

import numpy as np

REFERENCE_STEPS_PER_SEC = 10.0  # documented estimate, see module docstring

_MQAR_DATASET = {
    "name": "MQAR", "_name_": "mqar",
    "input_seq_length": 512, "num_kv_pairs": 64, "vocab_size": 8192,
    "num_train_examples": 2048, "num_test_examples": 256,
    "fixed_size": True,
}

_TRAIN = {
    "total_steps": 100, "batch_size": 64, "lr": 0.01, "wd": 0.1,
    "eval_every": 1000, "cosine_anneal": True, "param_group": None,
}

_LIN_ATT_MODEL = {
    "input_dim": 1, "output_dim": 8192, "layer": "transformer",
    "attention_fn": "lin-attention", "use_flash": False,
    "num_layers": 2, "hidden_dim": 128, "state_dim": 128,
    "num_heads": 1, "att_dropout": 0.0, "norm": "layer",
    "embedding": True, "vocab_size": 8192, "max_pos_embed": 512,
    "mixer": "none", "mixer_dim": 128, "dropout": 0.1,
    "classifier": False, "pooling": "mean", "dual": False,
}

# full reference budget for the SSD kernel (ref mqar/mqar-mamba2.yaml)
_MAMBA2_MODEL = {
    "layer": "mamba", "version": "mamba2", "num_layers": 2, "num_heads": 1,
    "input_dim": 1, "output_dim": 8192, "hidden_dim": 128, "state_dim": 128,
    "conv_dim": 4, "expansion": 1, "dropout": 0.0, "glu": True,
    "norm": "layer", "dual": False, "prenorm": True, "mixer": "none",
    "mixer_dim": 128, "classifier": False, "pooling": "none",
    "embedding": True, "token_embedding": True, "vocab_size": 8192,
    "max_pos_embed": 512,
}


_WT_DATASET = {
    "name": "WikiText", "_name_": "wikitext", "version": 103,
    "block_size": 1024, "synthetic": True, "fixed_size": True,
    "data_dir": "",
}

# the 61M-param reference LM config (wikitext-103-mamba2.yaml)
_WT_MAMBA2_MODEL = {
    "layer": "mamba", "version": "mamba2", "num_layers": 6, "num_heads": 8,
    "input_dim": 1, "output_dim": 50257, "hidden_dim": 512, "state_dim": 512,
    "conv_dim": 4, "expansion": 1, "dropout": 0.0, "glu": True,
    "norm": "layer", "dual": False, "prenorm": True, "mixer": "none",
    "mixer_dim": 512, "classifier": False, "pooling": "none",
    "embedding": True, "token_embedding": True, "vocab_size": 50257,
    "max_pos_embed": 1024,
}


def _sparse_k(model_cfg, ds):
    """Sparse-head K (shared gating helper, training/scan_loop.py):
    per-position decoders with ≥4×-sparse 2-D labels, K over train ∪ test.
    TLIE_SPARSE_HEAD=0 disables for A/B."""
    if os.environ.get("TLIE_SPARSE_HEAD", "1") == "0":
        return None
    from tlie_tpu.training.scan_loop import sparse_head_k_for

    return sparse_head_k_for(model_cfg, ds.train_labels, ds.test_labels)


def _setup(model_cfg, ds, ds_cfg=None, batch_size=64):
    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.models.registry import build_models
    from tlie_tpu.training.loop import _make_state

    # batch_size must be the measured batch: _make_state's init forward runs
    # at train.batch_size, and a 64-wide (L1024, V50k) init OOMs the chip
    raw = {"seed": 1919, "save": None,
           "dataset": dict(ds_cfg or _MQAR_DATASET),
           "train": {**_TRAIN, "batch_size": batch_size},
           "model": dict(model_cfg)}
    cfg = ExperimentConfig(raw).validate()
    cfg.derive_runtime_fields(ds)
    train_model, _, _ = build_models(cfg.model, False)
    state, _, rng = _make_state(cfg, train_model, integer_inputs=True)
    return cfg, train_model, state, rng


def _bench_train(model_cfg, ds, data, n_steps=200, ds_cfg=None, batch_size=64):
    """steps/s for one family on the device-resident scanned path — the
    framework's production training loop (training/scan_loop.py)."""
    from tlie_tpu.training.scan_loop import batch_indices, make_train_block

    cfg, train_model, state, rng = _setup(model_cfg, ds, ds_cfg, batch_size)
    train_block = make_train_block(
        train_model, "layer", ("regular",), warmup=0,
        total_steps=10_000, cosine=True, lr_min=1e-6,
        # fused decoder+softmax-CE (ops/fused_xent.py) measured SLOWER here
        # (73.6 vs 82 steps/s): its in-kernel matmuls run fp32 while XLA's
        # materialised-logits path rides bf16 MXU passes — kept opt-in
        fused_head=False,
        # production default (training/loop.py): gather the ≤K valid label
        # positions before the decoder when labels are mostly -100 — exact
        # same loss/grads, vocab path shrinks by L/K (8× at MQAR shapes).
        # TLIE_SPARSE_HEAD=0 disables for A/B.
        sparse_head_k=_sparse_k(model_cfg, ds),
    )
    nprng = np.random.default_rng(0)
    idx = batch_indices(nprng, len(ds.train_inputs), batch_size, n_steps)
    # warm up (compile); float() forces a synchronous host read —
    # block_until_ready does not reliably synchronise through the axon tunnel.
    # The block donates its input state, so every call rebinds it.
    state, loss = train_block(state, rng, data, idx[:1], 0, 0.01, 0.01)
    float(loss)
    state, loss = train_block(state, rng, data, idx, 0, 0.01, 0.01)
    float(loss)

    # min of two timed blocks — the SAME protocol as the layer-ablation
    # profiler (tools/profile_wikitext_layers.py), so the number of record
    # and the roofline narrative can be compared directly (VERDICT r3 #3);
    # min discards one-sided tunnel-latency spikes
    t0 = time.perf_counter()
    state, loss = train_block(state, rng, data, idx, 0, 0.01, 0.01)
    float(loss)
    t1 = time.perf_counter()
    state, loss = train_block(state, rng, data, idx, 0, 0.01, 0.01)
    float(loss)
    t2 = time.perf_counter()
    return n_steps / min(t1 - t0, t2 - t1)


def _bench_sweep_grid(ds, data, n_steps=100):
    """BASELINE.md sweep north star, driver-capturable (VERDICT r2 item 4):
    vmapped seed-grid point-steps/s on ONE chip for the mqar-lin-attention
    workload, plus the arithmetic projection of the full 16-point × 8k-step
    seed×LR sweep (configs/sweep/mqar-lin-attention-seeds-lrs-8k.yaml — the
    grid RESULTS.md measured in waves) onto v5e-8, against the <10 min
    BASELINE target."""
    import jax
    import jax.numpy as jnp

    from tlie_tpu.config import ExperimentConfig
    from tlie_tpu.models.registry import build_models
    from tlie_tpu.parallel.sweep import _stacked_state
    from tlie_tpu.training.scan_loop import batch_indices, make_train_block

    seeds = [1919, 2222, 2929, 1717]
    raw = {"seed": 1919, "save": None, "dataset": dict(_MQAR_DATASET),
           "train": {**_TRAIN, "batch_size": 64}, "model": dict(_LIN_ATT_MODEL)}
    cfg = ExperimentConfig(raw).validate()
    cfg.derive_runtime_fields(ds)
    train_model, _, _ = build_models(cfg.model, False)
    state = _stacked_state(cfg, train_model, seeds, integer_inputs=True)
    block = make_train_block(
        train_model, "layer", ("regular",), warmup=0,
        total_steps=8_000, cosine=True, lr_min=1e-6,
        sparse_head_k=_sparse_k(_LIN_ATT_MODEL, ds),
    )
    vblock = jax.jit(jax.vmap(
        lambda st, rng, d, idx, s0, lr, slr: block(st, rng, d, idx, s0, lr, slr),
        in_axes=(0, 0, None, None, None, 0, 0),
    ))
    g = len(seeds)
    rngs = jax.vmap(jax.random.PRNGKey)(jnp.arange(g, dtype=jnp.uint32))
    lrs = jnp.full((g,), 0.001, jnp.float32)
    nprng = np.random.default_rng(0)
    idx = jnp.asarray(batch_indices(nprng, len(ds.train_inputs), 64, n_steps))
    s0 = jnp.asarray(0, jnp.int32)

    state, loss = vblock(state, rngs, data, idx[:1], s0, lrs, lrs)  # compile
    float(loss[0])
    state, loss = vblock(state, rngs, data, idx, s0, lrs, lrs)      # warm
    float(loss[0])
    t0 = time.perf_counter()
    state, loss = vblock(state, rngs, data, idx, s0, lrs, lrs)
    float(loss[0])
    t1 = time.perf_counter()
    state, loss = vblock(state, rngs, data, idx, s0, lrs, lrs)
    float(loss[0])
    t2 = time.perf_counter()
    rate = g * n_steps / min(t1 - t0, t2 - t1)  # point-steps/s/chip

    # the full sweep = 16 points × 8k steps; on v5e-8 the grid axis shards
    # over 8 chips (parallel/mesh.py), so wall-clock ≈ total/(8 × rate)
    projected_min = 16 * 8_000 / (8.0 * rate) / 60.0
    return rate, projected_min


def _bench_analysis(ds):
    """Wall-clock of ONE full eval_eig checkpoint analysis (init + trained
    spectra extraction, threshold binning, artifact writes) at the
    reference's MQAR analysis batch size (BASELINE.md north star)."""
    from tlie_tpu.analysis import eval_eig
    from tlie_tpu.training import train

    workdir = tempfile.mkdtemp(prefix="bench_eig_")
    try:
        from tlie_tpu.config import ExperimentConfig

        raw = {"seed": 1919, "save": os.path.join(workdir, "ck"),
               "dataset": dict(_MQAR_DATASET),
               "train": {**_TRAIN, "total_steps": 5, "eval_every": 5},
               "model": dict(_LIN_ATT_MODEL)}
        cfg = ExperimentConfig(raw).validate()
        cfg.derive_runtime_fields(ds)
        tl = ds.train_dataloader(batch_size=64, shuffle=True)
        el = ds.test_dataloader(batch_size=64, shuffle=False)
        path, perf = train(cfg, tl, el, ds.get_metrics(), None)

        analysisloader = ds.test_dataloader(batch_size=64, shuffle=False)
        conf_args = {"batch_size": 64, "save_path": os.path.join(workdir, "out")}
        t0 = time.perf_counter()
        eval_eig(cfg.raw, conf_args, None, cfg.dataset, analysisloader, path, perf)
        cold = time.perf_counter() - t0
        # warm = per-checkpoint cost in a sweep: compiled graphs + cached
        # init spectra are reused, only the trained-checkpoint work repeats
        t1 = time.perf_counter()
        eval_eig(cfg.raw, conf_args, None, cfg.dataset, analysisloader, path, perf)
        return cold, time.perf_counter() - t1
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def _bench_decode(ds):
    """Serving throughput (tokens/s) of the new inference subsystem on the
    headline model: greedy generation, prefill+decode as one jitted scan
    (tools/bench_decode.py measures the larger LM shapes)."""
    import jax
    import jax.numpy as jnp

    from tlie_tpu.inference import Decoder
    from tlie_tpu.models.registry import build_models

    _, ev, _ = build_models(dict(_LIN_ATT_MODEL), False)
    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, 8192, (64, 32)), jnp.int32)
    variables = ev.init(jax.random.PRNGKey(0), toks)
    dec = Decoder(_LIN_ATT_MODEL, variables["params"])
    out = dec.generate(toks, n_new=224)
    float(out[0, -1])  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        out = dec.generate(toks, n_new=224)
        float(out[0, -1])
        best = min(best, time.perf_counter() - t0)
    return 64 * 224 / best


def main():
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training.scan_loop import put_dataset

    ds = SequenceDataset.registry["mqar"](**_MQAR_DATASET)
    ds.setup()
    data = put_dataset(ds.train_inputs, ds.train_labels)

    sps_lin = _bench_train(_LIN_ATT_MODEL, ds, data)
    sps_ssd = _bench_train(_MAMBA2_MODEL, ds, data)
    decode_tps = _bench_decode(ds)
    sweep_rate, sweep_proj_min = _bench_sweep_grid(ds, data)
    t_eig, t_eig_warm = _bench_analysis(ds)

    wt = SequenceDataset.registry["wikitext"](**_WT_DATASET)
    wt.setup()
    wt_data = put_dataset(wt.train_inputs, wt.train_labels)
    sps_wt = _bench_train(
        _WT_MAMBA2_MODEL, wt, wt_data,
        n_steps=50, ds_cfg=_WT_DATASET, batch_size=8,
    )
    sps_wt_bf16 = _bench_train(
        {**_WT_MAMBA2_MODEL, "compute_dtype": "bfloat16"}, wt, wt_data,
        n_steps=50, ds_cfg=_WT_DATASET, batch_size=8,
    )

    print(json.dumps({
        "metric": "mqar_lin_attention_train_steps_per_sec_per_chip",
        "value": round(sps_lin, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps_lin / REFERENCE_STEPS_PER_SEC, 3),
        "extra": {
            "mqar_mamba2_train_steps_per_sec_per_chip": round(sps_ssd, 3),
            "mqar_lin_attention_sweep_point_steps_per_sec_per_chip": round(sweep_rate, 3),
            "mqar_lin_attention_16pt_8k_sweep_projected_v5e8_minutes": round(sweep_proj_min, 2),
            "eval_eig_sec_per_checkpoint": round(t_eig, 3),
            "eval_eig_sec_per_checkpoint_warm": round(t_eig_warm, 3),
            "wikitext_mamba2_train_steps_per_sec_per_chip": round(sps_wt, 3),
            "wikitext_mamba2_bf16_train_steps_per_sec_per_chip": round(sps_wt_bf16, 3),
            "mqar_lin_attention_decode_tokens_per_sec": round(decode_tps, 0),
        },
    }))


if __name__ == "__main__":
    main()
