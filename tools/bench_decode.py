"""Decode/serving throughput on the real chip (tokens/s).

Measures ``inference.Decoder.generate`` — prefill scan + greedy generation
in ONE jitted program — for (a) the bench lin-attention LM and (b) the 61M
WikiText Mamba-2 config.  The reference has no decode path; these are the
serving numbers of the framework (RESULTS.md round 5).

Usage: python tools/bench_decode.py [fast|full]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from bench import _LIN_ATT_MODEL, _WT_MAMBA2_MODEL  # noqa: E402
from tlie_tpu.inference import Decoder  # noqa: E402
from tlie_tpu.models.registry import build_models  # noqa: E402


def bench_one(name, cfg, B, L0, n_new, reps=2, state_dtype=jnp.float32):
    _, ev, _ = build_models(dict(cfg), False)
    rng = np.random.default_rng(0)
    vocab = cfg["vocab_size"]
    toks = jnp.asarray(rng.integers(0, vocab, (B, L0)), jnp.int32)
    variables = ev.init(jax.random.PRNGKey(0), toks)
    dec = Decoder(cfg, variables["params"], state_dtype=state_dtype)
    t0 = time.perf_counter()
    out = dec.generate(toks, n_new=n_new)
    float(out[0, -1])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = dec.generate(toks, n_new=n_new)
        float(out[0, -1])
        best = min(best, time.perf_counter() - t0)
    steps = L0 + n_new
    print(
        f"{name}: B={B} prefill={L0} gen={n_new} | compile {compile_s:.1f}s | "
        f"{best*1e3:.0f} ms -> {best/steps*1e3:.3f} ms/token-step, "
        f"{B*n_new/best:,.0f} generated tokens/s"
    )


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fast"
    bench_one("mqar-lin-attention LM (2.3M)", _LIN_ATT_MODEL, 64, 32, 224)
    if mode == "full":
        bench_one("wikitext mamba2 (61M)", _WT_MAMBA2_MODEL, 8, 32, 224)
        bench_one("wikitext mamba2 (61M, bf16 state)", _WT_MAMBA2_MODEL,
                  8, 32, 224, state_dtype=jnp.bfloat16)
        # long-prompt regime: chunked-kernel prefill dominates (r5: 512-token
        # prompt 39 ms parallel vs 254 ms sequential at this shape)
        bench_one("wikitext mamba2 (61M, long prompt)", _WT_MAMBA2_MODEL,
                  8, 512, 32)


if __name__ == "__main__":
    main()
