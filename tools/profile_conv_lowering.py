"""A/B the two depthwise-causal-conv lowerings at the WikiText block shape.

ops/conv.py uses an unrolled shift-MAC for K<=8 and lax.conv_general_dilated
(feature_group_count) above; the WikiText per-op profile puts conv1536+silu
at ~0.5 ms real per application — this measures whether XLA's native grouped
conv beats the unrolled form at (B8, L1024, C1536) bf16, fwd+bwd.

Usage: python tools/profile_conv_lowering.py [depth]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 96
B, L, C = 8, 1024, 1536


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

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

    x = jax.random.normal(key, (B, L, C), jnp.bfloat16)
    w = {"w": jnp.full((4, C), 0.1, jnp.bfloat16), "b": jnp.zeros((C,), jnp.bfloat16)}

    timeit("floor_ms", nested_grad(lambda p, x: x * p["b"].astype(x.dtype) + x), w, x)

    def conv_unrolled(p, x):
        K = 4
        y = x * p["w"][K - 1]
        for k in range(K - 1):
            shift = K - 1 - k
            shifted = jnp.pad(x[..., :-shift, :], [(0, 0), (shift, 0), (0, 0)])
            y = y + shifted * p["w"][k]
        return jax.nn.silu(y + p["b"])

    timeit("conv_unrolled_silu_ms", nested_grad(conv_unrolled), w, x)

    def conv_lax(p, x):
        kernel = p["w"][:, None, :]  # (K, 1, C) 'LIO' depthwise
        y = lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(1,), padding=[(3, 0)],
            dimension_numbers=("NLC", "LIO", "NLC"), feature_group_count=C,
        )
        return jax.nn.silu(y + p["b"])

    timeit("conv_lax_grouped_silu_ms", nested_grad(conv_lax), w, x)

    print(json.dumps({"metric": "conv_lowering_ab_ms_per_application",
                      "depth": DEPTH, **rows}))


if __name__ == "__main__":
    main()
