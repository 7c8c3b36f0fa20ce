"""AAN document-retrieval task (LRA): do two papers cite-match?

Counterpart of ref dataloaders/lra.py:539-726: char-level tokenization of
document pairs from the lra_release ``new_aan_pairs.{train,test}.tsv``
files, padded to l_max; the model consumes the pair concatenated along the
batch axis and a MATCH head combines the two encodings (dual=True models,
ref models/transformer.py:141-142,156-158).

Storage here is (N, 2, L) so the pair rides one device-resident array; the
dual-capable models fold axis 1 into the batch.  Offline fallback: a
synthetic pair corpus with controllable overlap statistics.
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import List, Tuple

import numpy as np

from .base import SequenceDataset, argmax_accuracy


def _synthetic_pairs(
    n: int, seed: int, l_max: int = 4096
) -> Tuple[List[str], List[str], np.ndarray]:
    """Topic-matched pair corpus: each document samples its words from a
    per-document *topic* (a small random subset of the vocabulary); matched
    pairs share the topic, unmatched pairs draw two independent topics.

    This keeps the label genuinely relational (no single document reveals
    it) while being detectable through the model's narrow per-document
    encoding — the reference wiring bottlenecks each document to an
    ``output_dim``-dim vector before the MATCH head (ref
    models/transformer.py:141-142,156-158), so a shared-substring construct
    (the earlier stand-in) mean-pools to statistically identical encodings
    and pins training at chance; shared word *distributions* do not."""
    rng = np.random.default_rng(seed)
    vocab_words = [f"w{i}" for i in range(50)]
    topic_size, num_topics = 5, 10
    n_words_max = max(8, l_max // 4)  # ~4 chars per word incl. separator
    # a FIXED inventory of DISJOINT topics (constant generator → identical
    # across the train/test splits): the per-document encoding is
    # bottlenecked to output_dim dims before the MATCH head (the reference's
    # dual wiring, models/transformer.py:141-142,156-158), which can cluster
    # a small inventory of maximally-contrasting topics but not ~C(50,8)
    # fresh overlapping subsets
    topic_rng = np.random.default_rng(1234)
    _perm = topic_rng.permutation(50)
    topics = [_perm[i * topic_size : (i + 1) * topic_size]
              for i in range(num_topics)]

    def doc(topic: np.ndarray, n_words: int) -> str:
        return " ".join(vocab_words[i] for i in rng.choice(topic, size=n_words))

    t1, t2, ys = [], [], []
    for _ in range(n):
        y = int(rng.integers(0, 2))
        i1 = int(rng.integers(0, num_topics))
        i2 = i1 if y else int((i1 + 1 + rng.integers(0, num_topics - 1)) % num_topics)
        # documents fill most of l_max (~4 chars/word): the model mean-pools
        # over ALL positions including padding (the reference's torch path
        # ignores lengths, ref train.py:96-97) — half-empty documents would
        # dilute the topic signal under the unmasked pool
        t1.append(doc(topics[i1], int(rng.integers(int(0.8 * n_words_max), n_words_max))))
        t2.append(doc(topics[i2], int(rng.integers(int(0.8 * n_words_max), n_words_max))))
        ys.append(y)
    return t1, t2, np.asarray(ys, dtype=np.int64)


class AAN(SequenceDataset):
    _name_ = "aan"
    d_output = 2

    @property
    def init_defaults(self):
        # ref dataloaders/lra.py:548-557
        return {
            "l_max": 4096,
            "fixed_size": False,
            "append_bos": False,
            "append_eos": True,
            "seed": 42,
            "synthetic": False,
            "synthetic_train": 512,
            "synthetic_test": 128,
        }

    def get_metrics(self, layer: str = "s4"):
        return argmax_accuracy

    def _read_tsv(self, path: Path):
        t1, t2, ys = [], [], []
        with open(path) as f:
            for line in f:
                cols = line.rstrip("\n").split("\t")
                # lra_release layout: label, id1, id2, text1, text2
                ys.append(int(float(cols[0])))
                t1.append(cols[3])
                t2.append(cols[4])
        return t1, t2, np.asarray(ys, dtype=np.int64)

    def setup(self) -> None:
        root = Path(self.data_dir) if self.data_dir else None
        if root and (root / "new_aan_pairs.train.tsv").is_file():
            tr1, tr2, tr_y = self._read_tsv(root / "new_aan_pairs.train.tsv")
            te1, te2, te_y = self._read_tsv(root / "new_aan_pairs.test.tsv")
        else:
            if not self.synthetic:
                print(
                    f"AAN | no lra_release TSVs under {self.data_dir!r}; using a "
                    "synthetic pair corpus (set dataset.synthetic: true to silence)"
                )
            tr1, tr2, tr_y = _synthetic_pairs(self.synthetic_train, self.seed, self.l_max)
            te1, te2, te_y = _synthetic_pairs(self.synthetic_test, self.seed + 1, self.l_max)

        budget = self.l_max - int(self.append_bos) - int(self.append_eos)
        counter: Counter = Counter()
        for t in tr1 + tr2:
            counter.update(list(t)[:budget])
        specials = ["<pad>", "<unk>"] + (
            ["<bos>"] if self.append_bos else []
        ) + (["<eos>"] if self.append_eos else [])
        self.vocab = {
            t: i for i, t in enumerate(specials + [t for t, _ in counter.most_common()])
        }
        self.vocab_size = len(self.vocab)
        self.pad_id = self.vocab["<pad>"]
        unk = self.vocab["<unk>"]

        def pack_pairs(a: List[str], b: List[str]) -> np.ndarray:
            out = np.full((len(a), 2, self.l_max), self.pad_id, dtype=np.int64)
            for i, (ta, tb) in enumerate(zip(a, b)):
                for j, text in enumerate((ta, tb)):
                    ids = [self.vocab.get(ch, unk) for ch in list(text)[:budget]]
                    if self.append_bos:
                        ids = [self.vocab["<bos>"]] + ids
                    if self.append_eos:
                        ids = ids + [self.vocab["<eos>"]]
                    out[i, j, : len(ids)] = ids
            return out

        self.train_inputs = pack_pairs(tr1, tr2)
        self.train_labels = tr_y
        self.test_inputs = pack_pairs(te1, te2)
        self.test_labels = te_y
        print(f"AAN | vocab size {self.vocab_size} | train {len(tr_y)} test {len(te_y)}")
