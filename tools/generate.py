"""Generate tokens from a trained checkpoint (the serving CLI).

Usage:
  python tools/generate.py <checkpoint_dir> --n_new 64 \
      [--prompt 12,55,7] [--batch 4 --prompt_len 16 --seed 0] \
      [--temperature 0.8 --top_k 40 --top_p 0.9]

With no --prompt, a random prompt of --prompt_len tokens per batch row is
drawn from the model vocabulary.  Prints the full token matrix (prompt +
generated) as one row per line.
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--n_new", type=int, default=64)
    ap.add_argument("--prompt", type=str, default=None,
                    help="comma-separated token ids (single row)")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prompt_len", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--top_k", type=int, default=0)
    ap.add_argument("--top_p", type=float, default=0.0)
    args = ap.parse_args()

    import jax

    from tlie_tpu.inference import Decoder

    dec = Decoder.from_checkpoint(args.checkpoint)
    vocab = dec.cfg.get("vocab_size") or dec.cfg["input_dim"]
    if args.prompt:
        prompt = np.asarray(
            [[int(t) for t in args.prompt.split(",")]], np.int32
        )
    else:
        rng = np.random.default_rng(args.seed)
        prompt = rng.integers(
            0, vocab, (args.batch, args.prompt_len)
        ).astype(np.int32)
    out = dec.generate(
        prompt, args.n_new, temperature=args.temperature,
        rng=jax.random.PRNGKey(args.seed),
        top_k=args.top_k, top_p=args.top_p,
    )
    for row in np.asarray(out):
        print(" ".join(str(int(t)) for t in row))


if __name__ == "__main__":
    main()
