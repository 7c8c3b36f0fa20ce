"""On-chip numerics check of the Pallas SSD decay-attention kernel.

The kernel (ops/pallas_ssd.py) is opt-in after losing its round-4 A/B, but
its correctness tests run in interpret mode on CPU — this drives the REAL
Mosaic lowering on the TPU chip and compares fwd + all input grads against
the XLA scores path at an eligible shape (ADVICE r3: "Mosaic lowering never
tested" — this closes it).

Usage: python tools/verify_pallas_ssd_chip.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tlie_tpu.ops.ssd import ssd_chunked_scan

    B, L, H, P, N = 2, 256, 2, 64, 128  # eligible: L%256==0, N%128, P%64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (B, L, H, P), jnp.float32) * 0.5
    dt = jax.random.uniform(ks[1], (B, L, H), jnp.float32) * 0.1 + 0.01
    A = -jnp.exp(jax.random.normal(ks[2], (H,)) * 0.3)
    Bm = jax.random.normal(ks[3], (B, L, 1, N), jnp.float32) * 0.2
    Cm = jax.random.normal(ks[4], (B, L, 1, N), jnp.float32) * 0.2

    def loss(x, dt, Bm, Cm):
        y = ssd_chunked_scan(x, dt, A, Bm, Cm, chunk_size=256)
        return jnp.sum(y * jnp.cos(jnp.arange(P, dtype=jnp.float32)))

    def run():
        f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
        v, gs = f(x, dt, Bm, Cm)
        return np.asarray(v), [np.asarray(g) for g in gs]

    os.environ.pop("TLIE_SSD_INTRA", None)
    v_x, g_x = run()
    os.environ["TLIE_SSD_INTRA"] = "pallas"
    v_p, g_p = run()

    rows = {"value_rel_err": float(abs(v_p - v_x) / (abs(v_x) + 1e-30))}
    for name, a, b in zip(("dx", "ddt", "dB", "dC"), g_x, g_p):
        denom = np.abs(a).max() + 1e-30
        rows[f"{name}_max_rel_err"] = float(np.abs(a - b).max() / denom)
    ok = all(e < 1e-4 for e in rows.values())
    print(json.dumps({
        "metric": "pallas_ssd_chip_numerics",
        "backend": jax.default_backend(),
        "shape": f"B{B}xL{L}xH{H}xP{P}xN{N}",
        **{k: round(v, 9) for k, v in rows.items()},
        "ok": ok,
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
