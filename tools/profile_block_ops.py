"""Per-op fwd+bwd costs inside the WikiText Mamba block, measured honestly.

Each candidate op f is applied NESTED (x → f(f(...f(x)))) so XLA cannot
hoist or prune it, and the whole chain is differentiated — per-application
cost = total / depth.  Shapes are the 61M WikiText block's (B8, L1024),
bf16 activations / f32 norm+scalar params, on the chip.

Usage: python tools/profile_block_ops.py [depth]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 24
B, L, D = 8, 1024, 512
CONV_DIM = D + 2 * D  # d_inner + 2*g*n at the wikitext shape (1536)
V = 50257


def main():
    import jax
    import jax.numpy as jnp

    from tlie_tpu.ops.conv import depthwise_causal_conv1d
    from tlie_tpu.training.steps import cross_entropy_loss

    key = jax.random.PRNGKey(0)

    def timeit(name, fn, *args):
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.tree.leaves(out)[0].reshape(-1)[0])
        ms = (time.perf_counter() - t0) / DEPTH * 1e3
        rows[name] = round(ms, 3)

    def nested_grad(f):
        """grad of mean(chain(f)^2) wrt (params, x): fwd+bwd of DEPTH copies."""

        def loss(p, x):
            for _ in range(DEPTH):
                x = f(p, x)
            return jnp.mean(x.astype(jnp.float32) ** 2)

        return jax.jit(jax.grad(loss, argnums=(0, 1)))

    rows = {}

    # conv branch: depthwise causal K4 over conv_dim + silu
    xc = jax.random.normal(key, (B, L, CONV_DIM), jnp.bfloat16)
    wc = {"w": jnp.ones((4, CONV_DIM), jnp.bfloat16) * 0.1,
          "b": jnp.zeros((CONV_DIM,), jnp.bfloat16)}
    timeit("conv1536_silu_ms",
           nested_grad(lambda p, x: jax.nn.silu(
               depthwise_causal_conv1d(x, p["w"], p["b"]))), wc, xc)

    x5 = jax.random.normal(key, (B, L, D), jnp.bfloat16)

    # layernorm (f32 params, promoted stats)
    wn = {"s": jnp.ones((D,), jnp.float32), "b": jnp.zeros((D,), jnp.float32)}

    # dispatch floor: tunnel RTT / depth — subtract before reading any row
    timeit("floor_scale_ms",
           nested_grad(lambda p, x: x * p["s"][0].astype(x.dtype)), wn, x5)

    def ln(p, x):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        return ((xf - mu) / jnp.sqrt(var + 1e-5) * p["s"] + p["b"]).astype(x.dtype)

    timeit("layernorm512_ms", nested_grad(ln), wn, x5)

    # gelu
    timeit("gelu512_ms",
           nested_grad(lambda p, x: jax.nn.gelu(x, approximate=False) + 0 * p["s"].astype(x.dtype)),
           wn, x5)

    # GLU: Dense D→2D + gate back to D
    wg = {"k": jax.random.normal(key, (D, 2 * D), jnp.bfloat16) * 0.02,
          "b": jnp.zeros((2 * D,), jnp.bfloat16)}

    def glu(p, x):
        h = x @ p["k"] + p["b"]
        return h[..., :D] * jax.nn.sigmoid(h[..., D:])

    timeit("glu512_ms", nested_grad(glu), wg, x5)

    # in_proj-sized matmul D→(conv_dim + heads)
    wi = {"k": jax.random.normal(key, (D, CONV_DIM + 8), jnp.bfloat16) * 0.02}
    timeit("in_proj_ms",
           nested_grad(lambda p, x: (x @ p["k"])[..., :D]), wi, x5)

    # embedding gather + scatter-add backward (token path)
    toks = jax.random.randint(key, (B, L), 0, V)
    we = {"e": jax.random.normal(key, (V, D), jnp.float32)}

    @jax.jit
    def embed_grad(p):
        def loss(p):
            tot = 0.0
            for i in range(DEPTH):
                tot = tot + jnp.mean(jnp.take(p["e"], (toks + i) % V, axis=0) ** 2)
            return tot

        return jax.grad(loss)(p)

    timeit("embed_gather_scatter_ms", embed_grad, we)

    # decoder + CE head (bf16 matmul, f32 logsumexp)
    wd = {"k": jax.random.normal(key, (D, V), jnp.bfloat16) * 0.02,
          "b": jnp.zeros((V,), jnp.bfloat16)}
    y = jax.random.randint(key, (B, L), 0, V)

    @jax.jit
    def head_grad(p, x):
        def loss(p, x):
            tot = 0.0
            for i in range(DEPTH):
                logits = x @ p["k"] + p["b"]
                tot = tot + cross_entropy_loss(logits, (y + i) % V)
            return tot

        return jax.grad(loss, argnums=(0, 1))(p, x)

    timeit("decoder_ce_ms", head_grad, wd, x5)

    print(json.dumps({"metric": "wikitext_block_op_costs_ms_per_application",
                      "depth": DEPTH, **rows}))


if __name__ == "__main__":
    main()
