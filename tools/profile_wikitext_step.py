"""Subtractive profile of one WikiText Mamba-2 train step (VERDICT r2 item 3).

Times, at the full 61M-param reference LM shape (d512, 6 layers, block 1024,
vocab 50257, batch 8, bf16 compute):

  * full      — the production scanned train step (fwd+bwd+Adam)
  * head_only — decoder matmul + CE loss fwd+bwd on fixed features
  * body_only — model features fwd+bwd with a cheap mean loss (no LM head)
  * opt_only  — apply_gradients on fixed grads (optimizer traffic)
  * ssd_only  — the 6 chunked SSD scans fwd+bwd in isolation

Each is a K-step lax.scan (amortising dispatch), timed warm.  Prints one
JSON line; run on the chip.  Usage: python tools/profile_wikitext_step.py [K]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 20
B, L, D, V, NL, H = 8, 1024, 512, 50257, 6, 8


def main():
    import jax
    import jax.numpy as jnp

    from bench import _WT_DATASET, _WT_MAMBA2_MODEL, _setup
    from tlie_tpu.data import SequenceDataset
    from tlie_tpu.training.scan_loop import (
        batch_indices, make_train_block, put_dataset,
    )
    from tlie_tpu.training.steps import cross_entropy_loss

    wt = SequenceDataset.registry["wikitext"](
        **{**_WT_DATASET, "synthetic_train_tokens": 300_000,
           "synthetic_test_tokens": 50_000}
    )
    wt.setup()
    data = put_dataset(wt.train_inputs, wt.train_labels)
    model_cfg = {**_WT_MAMBA2_MODEL, "compute_dtype": "bfloat16"}
    cfg, model, state, rng = _setup(model_cfg, wt, _WT_DATASET, batch_size=B)

    def timed(fn, *args):
        out = fn(*args)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        # block_until_ready is unreliable through the tunnel — force a read
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / K * 1e3  # ms/step

    rows = {}

    params = state.params
    x0 = jnp.asarray(wt.train_inputs[:B])
    y0 = jnp.asarray(wt.train_labels[:B])

    # --- body (features) fwd+bwd ----------------------------------------
    @jax.jit
    def body_only(p):
        def one(c, _):
            def loss_fn(p):
                f = model.apply({"params": p}, x0, method=type(model).features)
                return jnp.mean(f.astype(jnp.float32) ** 2)

            _, g = jax.value_and_grad(loss_fn)(p)
            return c, jax.tree.leaves(g)[0].reshape(-1)[0]

        _, ls = jax.lax.scan(one, 0, None, length=K)
        return ls

    rows["body_ms"] = timed(body_only, params)

    # --- LM head fwd+bwd on fixed features ------------------------------
    feats = jnp.zeros((B, L, D), jnp.bfloat16)

    @jax.jit
    def head_only(p):
        def one(c, _):
            def loss_fn(p):
                logits = feats @ p["decoder"]["kernel"].astype(jnp.bfloat16)
                logits = logits + p["decoder"]["bias"].astype(jnp.bfloat16)
                return cross_entropy_loss(logits, y0)

            _, g = jax.value_and_grad(loss_fn)(p)
            return c, jax.tree.leaves(g)[0].reshape(-1)[0]

        _, ls = jax.lax.scan(one, 0, None, length=K)
        return ls

    rows["head_ms"] = timed(head_only, params)

    # --- optimizer on fixed grads ----------------------------------------
    grads = jax.tree.map(jnp.zeros_like, params)

    @jax.jit
    def opt_only(st):
        def one(s, _):
            s = s.apply_gradients(grads=grads)
            return s, 0.0

        s, _ = jax.lax.scan(one, st, None, length=K)
        return s.step

    rows["opt_ms"] = timed(opt_only, state)

    # --- SSD scans in isolation ------------------------------------------
    from tlie_tpu.ops.ssd import ssd_chunked_scan

    hd = D // H
    xs = jnp.ones((B, L, H, hd), jnp.bfloat16)
    dt = jnp.full((B, L, H), 0.01, jnp.float32)
    A = -jnp.ones((H,), jnp.float32)
    Bm = jnp.ones((B, L, 1, D), jnp.bfloat16) * 0.02
    Cm = jnp.ones((B, L, 1, D), jnp.bfloat16) * 0.02

    @jax.jit
    def ssd_only(xs):
        def one(c, _):
            def loss_fn(xs):
                tot = 0.0
                for _ in range(NL):
                    y = ssd_chunked_scan(xs, dt, A, Bm, Cm, chunk_size=512)
                    tot = tot + jnp.mean(y.astype(jnp.float32) ** 2)
                return tot

            _, g = jax.value_and_grad(loss_fn)(xs)
            return c, g.reshape(-1)[0]

        _, ls = jax.lax.scan(one, 0, None, length=K)
        return ls

    rows["ssd6_ms"] = timed(ssd_only, xs)

    # --- full production step LAST: the block donates its input state,
    # invalidating params for the partial measurements above -------------
    block = make_train_block(model, "layer", ("regular",), 0, 10_000, True, 1e-6)
    nprng = np.random.default_rng(0)
    idx = batch_indices(nprng, len(wt.train_inputs), B, K)
    t0 = time.perf_counter()
    st2, loss = block(state, rng, data, idx, 0, 1e-3, 1e-3)
    float(loss)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    st2, loss = block(st2, rng, data, idx, 0, 1e-3, 1e-3)
    float(loss)
    rows["full_ms"] = (time.perf_counter() - t0) / K * 1e3
    del st2

    rows = {k: round(v, 2) for k, v in rows.items()}
    rows["compile_s"] = round(compile_s, 1)
    rows["steps_per_sec_full"] = round(1e3 / rows["full_ms"], 2)
    print(json.dumps({"metric": "wikitext_bf16_step_breakdown_ms", **rows}))


if __name__ == "__main__":
    main()
