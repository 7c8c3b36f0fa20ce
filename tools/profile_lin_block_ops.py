"""Per-op fwd+bwd costs inside the MQAR lin-attention block.

With the sparse decoder head the headline step is 7.0 ms of which
~2.37 ms/layer × 2 layers is the transformer block itself (layer-count
ablation, RESULTS.md round 4) — FLOP-wise the block is worth ~0.5 ms, so
this breaks the per-layer cost into its ops the same way
tools/profile_block_ops.py does for the WikiText Mamba block: each op
NESTED depth-deep (XLA cannot hoist/prune), whole chain differentiated,
per-application cost = total/depth.  Shapes are the headline bench's
(B64, L512, D128, H1, d_qk 128), f32 — the reference trains MQAR in f32.

Usage: python tools/profile_lin_block_ops.py [depth]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 128
B, L, D = 64, 512, 128


def main():
    import jax
    import jax.numpy as jnp

    from tlie_tpu.ops.linear_attention import chunked_linear_attention

    key = jax.random.PRNGKey(0)
    rows = {}

    def timeit(name, fn, *args):
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t1 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        ms = min(t1 - t0, time.perf_counter() - t1) / DEPTH * 1e3
        rows[name] = round(ms, 4)

    def nested_grad(f):
        def loss(p, x):
            for _ in range(DEPTH):
                x = f(p, x)
            return jnp.mean(x.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    x = jax.random.normal(key, (B, L, D), jnp.float32)

    # layernorm (pre-norm branch)
    wn = {"s": jnp.ones((D,), jnp.float32), "b": jnp.zeros((D,), jnp.float32)}

    # dispatch floor: a depth-deep chain of scale-by-param — measures the
    # tunnel RTT + per-application read/write floor that every row below
    # carries; subtract it mentally before comparing ops (at depth 24 the
    # floor was ~1.4 ms/application: pure tunnel, see RESULTS round 4)
    timeit("floor_scale_ms", nested_grad(lambda p, x: x * p["s"][0]), wn, x)

    def ln(p, x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * p["s"] + p["b"]

    timeit("layernorm128_ms", nested_grad(ln), wn, x)

    # fused Wqkv projection D→3D (d_qk == D at the bench shape)
    wq = {"k": jax.random.normal(key, (D, 3 * D), jnp.float32) * 0.05}
    timeit("wqkv_proj_ms", nested_grad(lambda p, x: (x @ p["k"])[..., :D]), wq, x)

    # elu+1 feature map (applied to q and k)
    timeit("elu_feature_ms",
           nested_grad(lambda p, x: jax.nn.elu(x) + 1.0 + 0 * p["s"]), wn, x)

    # chunked linear attention core (q = k = v = x reshaped to H1)
    def att(p, x):
        h = (x * p["s"]).reshape(B, L, 1, D)
        return chunked_linear_attention(h, h, h).reshape(B, L, D)

    timeit("chunked_linear_attention_ms", nested_grad(att), wn, x)

    # out_proj D→D
    wo = {"k": jax.random.normal(key, (D, D), jnp.float32) * 0.05}
    timeit("out_proj_ms", nested_grad(lambda p, x: x @ p["k"]), wo, x)

    # dropout (rate 0.1): fresh threefry bits per application, like the block
    def drop(p, x):
        r = jax.random.fold_in(jax.random.PRNGKey(1), jnp.int32(x.sum() % 7))
        keep = jax.random.bernoulli(r, 0.9, x.shape)
        return jnp.where(keep, x / 0.9, 0.0) * p["s"][0]

    timeit("dropout_ms", nested_grad(drop), wn, x)

    # residual add
    timeit("residual_add_ms", nested_grad(lambda p, x: x + x * p["s"][0]), wn, x)

    print(json.dumps({"metric": "lin_block_op_costs_ms_per_application",
                      "depth": DEPTH, **rows}))


if __name__ == "__main__":
    main()
