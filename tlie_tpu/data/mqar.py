"""MQAR — multi-query associative recall (zoology-style synthetic task).

Same task semantics as the reference generator (ref dataloaders/mqar.py:16-136):
``num_kv_pairs`` unique key/value bigrams followed by power-law-spaced
queries; labels are −100 except at query positions, which carry the value
bound to the queried key; zeros optionally replaced by random fillers.

Generation is fully vectorised numpy (the reference's per-row
``np.apply_along_axis(np.random.choice, ...)`` loops are replaced by
permutation slicing and Gumbel-top-k weighted sampling without replacement),
so 100k examples synthesise in well under a second — no disk cache needed,
though one is supported for parity.
"""

from __future__ import annotations

import numpy as np

from .base import SequenceDataset, masked_accuracy


def multiquery_ar(
    vocab_size: int,
    num_examples: int,
    input_seq_len: int,
    seed: int,
    power_a: float = 0.01,
    num_kv_pairs: int = 8,
    random_non_queries: bool = True,
    **kwargs,
):
    """Generate (inputs, labels) int64 arrays of shape (num_examples, L)."""
    assert input_seq_len % 2 == 0, "input_seq_len must be even"
    assert vocab_size > input_seq_len
    assert num_kv_pairs * 4 <= input_seq_len

    rng = np.random.default_rng(seed)
    context_size = num_kv_pairs * 2
    key_vocab_size = vocab_size // 2

    # unique keys / values per example: slice per-row permutations
    def unique_choice(lo, hi, k):
        # argsort of uniforms = random permutation per row; take the first k
        u = rng.random((num_examples, hi - lo))
        return lo + np.argsort(u, axis=1)[:, :k]

    keys = unique_choice(1, key_vocab_size, num_kv_pairs)
    values = unique_choice(key_vocab_size, vocab_size, num_kv_pairs)

    kvs = np.zeros((num_examples, context_size), dtype=np.int64)
    kvs[:, 0::2] = keys
    kvs[:, 1::2] = values

    # power-law gap distribution over the query region
    space = (input_seq_len - context_size) // 2
    p = power_a * np.arange(1, space + 1) ** (power_a - 1)
    p = p / p.sum()
    # weighted sampling without replacement per row: Gumbel-top-k
    gumbel = -np.log(-np.log(rng.random((num_examples, space))))
    gaps = np.argsort(-(np.log(p)[None, :] + gumbel), axis=1)[:, :num_kv_pairs]

    queries = np.zeros((num_examples, input_seq_len - context_size + 1), dtype=np.int64)
    np.put_along_axis(queries, gaps * 2, keys, axis=1)
    examples = np.concatenate([kvs, queries], axis=1)

    labels = np.full((num_examples, input_seq_len + 1), -100, dtype=np.int64)
    np.put_along_axis(labels, gaps * 2 + context_size + 1, values, axis=1)

    inputs, labels = examples[:, :-1], labels[:, 1:]

    if random_non_queries:
        zeros = inputs == 0
        inputs = np.where(zeros, rng.integers(0, vocab_size, size=inputs.shape), inputs)
    return inputs, labels


class MQAR(SequenceDataset):
    _name_ = "mqar"

    @property
    def init_defaults(self):
        # ref dataloaders/mqar.py:143-155
        return {
            "seed": 42,
            "vocab_size": 8_192,
            "num_train_examples": 100_000,
            "num_test_examples": 3_000,
            "input_seq_length": 64,
            "num_kv_pairs": 8,
            "train_power_a": 0.01,
            "test_power_a": 0.01,
            "random_non_queries": True,
        }

    @property
    def l_max(self) -> int:
        return self.input_seq_length

    @property
    def d_output(self) -> int:
        return self.vocab_size

    def get_metrics(self, layer: str = "s4"):
        return masked_accuracy

    def setup(self) -> None:
        if getattr(self, "use_native", True):
            from ..native import mqar_generate_native

            native = mqar_generate_native(
                vocab_size=self.vocab_size,
                num_examples=self.num_train_examples,
                input_seq_len=self.input_seq_length,
                seed=self.seed,
                power_a=self.train_power_a,
                num_kv_pairs=self.num_kv_pairs,
                random_non_queries=self.random_non_queries,
            )
            if native is not None:
                self.train_inputs, self.train_labels = native
                self.test_inputs, self.test_labels = mqar_generate_native(
                    vocab_size=self.vocab_size,
                    num_examples=self.num_test_examples,
                    input_seq_len=self.input_seq_length,
                    seed=self.seed + 1,
                    power_a=self.test_power_a,
                    num_kv_pairs=self.num_kv_pairs,
                    random_non_queries=self.random_non_queries,
                )
                return
        self.train_inputs, self.train_labels = multiquery_ar(
            vocab_size=self.vocab_size,
            num_examples=self.num_train_examples,
            input_seq_len=self.input_seq_length,
            seed=self.seed,
            power_a=self.train_power_a,
            num_kv_pairs=self.num_kv_pairs,
            random_non_queries=self.random_non_queries,
        )
        self.test_inputs, self.test_labels = multiquery_ar(
            vocab_size=self.vocab_size,
            num_examples=self.num_test_examples,
            input_seq_len=self.input_seq_length,
            seed=self.seed + 1,  # distinct stream from train
            power_a=self.test_power_a,
            num_kv_pairs=self.num_kv_pairs,
            random_non_queries=self.random_non_queries,
        )
