"""Per-op fwd+bwd costs inside the MQAR Mamba-2 block.

The sparse-head mamba2 bench step is 8.58 ms with a measured per-layer
slope of 3.31 ms (L1/L2/L4 ablations, RESULTS round 4) where FLOPs+traffic
justify ~1.4 ms — this breaks the layer into its ops (nested differentiated
chains; floor row = tunnel dispatch / depth).  Shapes are the MQAR bench's
(B64, L512, d128, H1, P128, N128, conv 4), f32.

Usage: python tools/profile_mamba2_block_ops.py [depth]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
B, L, D = 64, 512, 128
N = 128          # d_state
CONV_DIM = D + 2 * N  # 384


def main():
    import jax
    import jax.numpy as jnp

    from tlie_tpu.ops.conv import depthwise_causal_conv1d
    from tlie_tpu.ops.ssd import ssd_chunked_scan

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
    wn = {"s": jnp.ones((D,), jnp.float32), "b": jnp.zeros((D,), jnp.float32)}

    # vector broadcast (not a scalar): a depth-long chain of scalar-grad
    # accumulations overflowed scoped VMEM at depth 96 on v5e
    timeit("floor_scale_ms", nested_grad(lambda p, x: x * p["s"]), wn, x)

    def ln(p, x):
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / jnp.sqrt(var + 1e-5) * p["s"] + p["b"]

    timeit("layernorm128_ms", nested_grad(ln), wn, x)

    # in_proj D→(conv_dim + H)
    wi = {"k": jax.random.normal(key, (D, CONV_DIM + 1), jnp.float32) * 0.05}
    timeit("in_proj_ms", nested_grad(lambda p, x: (x @ p["k"])[..., :D]), wi, x)

    # conv384 + silu at (B, L, 384) f32
    xc = jax.random.normal(key, (B, L, CONV_DIM), jnp.float32)
    wc = {"w": jnp.ones((4, CONV_DIM), jnp.float32) * 0.1,
          "b": jnp.zeros((CONV_DIM,), jnp.float32)}

    @jax.jit
    def conv_grad(p, x):
        def loss(p, x):
            for _ in range(DEPTH):
                x = jax.nn.silu(depthwise_causal_conv1d(x, p["w"], p["b"]))
            return jnp.mean(x ** 2)

        return jax.grad(loss, argnums=(0, 1))(p, x)

    timeit("conv384_silu_ms", conv_grad, wc, xc)

    # the SSD chunked scan itself (C==1 fast path at these shapes)
    wa = {"A": jnp.full((1,), -0.5, jnp.float32),
          "D": jnp.ones((1,), jnp.float32),
          "dt": jax.random.uniform(key, (B, L, 1), jnp.float32) * 0.1 + 0.01,
          "Bm": jax.random.normal(key, (B, L, 1, N), jnp.float32) * 0.1,
          "Cm": jax.random.normal(jax.random.fold_in(key, 1), (B, L, 1, N), jnp.float32) * 0.1}

    def ssd(p, x):
        y = ssd_chunked_scan(
            x.reshape(B, L, 1, D), p["dt"],
            p["A"], p["Bm"], p["Cm"], D=p["D"],
        )
        return y.reshape(B, L, D)

    timeit("ssd_scan_ms", nested_grad(ssd), wa, x)

    # out_proj D→D
    wo = {"k": jax.random.normal(key, (D, D), jnp.float32) * 0.05}
    timeit("out_proj_ms", nested_grad(lambda p, x: x @ p["k"]), wo, x)

    # GLU mixer: Dense D→2D, gate
    wg = {"k": jax.random.normal(key, (D, 2 * D), jnp.float32) * 0.05,
          "b": jnp.zeros((2 * D,), jnp.float32)}

    def glu(p, x):
        h = x @ p["k"] + p["b"]
        return h[..., :D] * jax.nn.sigmoid(h[..., D:])

    timeit("glu128_ms", nested_grad(glu), wg, x)

    print(json.dumps({"metric": "mamba2_block_op_costs_ms_per_application",
                      "depth": DEPTH, **rows}))


if __name__ == "__main__":
    main()
