"""IMDB sentiment classification, char-level (LRA text task).

Pipeline parity with the reference (ref dataloaders/lra.py:28-190):
char-level tokenization with a min-frequency vocab built on train, <eos>
appended, padded to l_max, binary labels; metric = accuracy.

Offline sources, tried in order:
  1. HF ``imdb`` dataset locally cached under data_dir;
  2. plain-text folders ``{train,test}/{pos,neg}/*.txt`` under data_dir
     (the original aclImdb layout);
  3. ``synthetic: true`` → a generated corpus with class-dependent
     character statistics so the full pipeline remains exercisable offline
     (clearly labelled — not the real task).
"""

from __future__ import annotations

from collections import Counter
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .base import SequenceDataset, argmax_accuracy


def _load_hf_imdb(data_dir) -> Optional[Tuple[List[str], np.ndarray, List[str], np.ndarray]]:
    try:
        from datasets import load_dataset

        ds = load_dataset("imdb", cache_dir=str(data_dir) if data_dir else None)
        return (
            list(ds["train"]["text"]),
            np.asarray(ds["train"]["label"], dtype=np.int64),
            list(ds["test"]["text"]),
            np.asarray(ds["test"]["label"], dtype=np.int64),
        )
    except Exception:
        return None


def _load_acl_imdb(data_dir) -> Optional[Tuple[List[str], np.ndarray, List[str], np.ndarray]]:
    if data_dir is None:
        return None
    root = Path(data_dir)
    if not (root / "train" / "pos").is_dir():
        return None
    out = []
    for split in ("train", "test"):
        texts, labels = [], []
        for label, sub in ((1, "pos"), (0, "neg")):
            for p in sorted((root / split / sub).glob("*.txt")):
                texts.append(p.read_text(errors="ignore"))
                labels.append(label)
        out.extend([texts, np.asarray(labels, dtype=np.int64)])
    return tuple(out)  # type: ignore[return-value]


def _synthetic_reviews(n: int, seed: int) -> Tuple[List[str], np.ndarray]:
    rng = np.random.default_rng(seed)
    pos_words = ["great", "wonderful", "excellent", "superb", "loved", "amazing"]
    neg_words = ["terrible", "awful", "boring", "horrible", "hated", "bland"]
    neutral = ["movie", "film", "plot", "actor", "scene", "the", "a", "was", "and", "very"]
    texts, labels = [], []
    for _ in range(n):
        y = int(rng.integers(0, 2))
        pool = neutral + (pos_words if y else neg_words) * 2
        k = int(rng.integers(40, 400))
        words = [pool[rng.integers(0, len(pool))] for _ in range(k)]
        texts.append(" ".join(words))
        labels.append(y)
    return texts, np.asarray(labels, dtype=np.int64)


class IMDB(SequenceDataset):
    _name_ = "imdb"
    d_output = 2

    @property
    def init_defaults(self):
        # ref dataloaders/lra.py:33-46
        return {
            "l_max": 4096,
            "fixed_size": False,
            "level": "char",
            "min_freq": 15,
            "seed": 42,
            "append_bos": False,
            "append_eos": True,
            "synthetic": False,
            "synthetic_train": 2048,
            "synthetic_test": 512,
        }

    def get_metrics(self, layer: str = "s4"):
        return argmax_accuracy

    def setup(self) -> None:
        data = None
        if not self.synthetic:
            data = _load_hf_imdb(self.data_dir) or _load_acl_imdb(self.data_dir)
            if data is None:
                print(
                    f"IMDB | no local dataset under {self.data_dir!r} and "
                    "downloads are disabled; using a synthetic stand-in "
                    "corpus (set dataset.synthetic: true to silence)"
                )
        if data is None:
            tr_t, tr_y = _synthetic_reviews(self.synthetic_train, self.seed)
            te_t, te_y = _synthetic_reviews(self.synthetic_test, self.seed + 1)
        else:
            tr_t, tr_y, te_t, te_y = data

        if self.level != "char":
            raise NotImplementedError(
                "word-level IMDB needs a spacy tokenizer (unavailable offline); "
                "use level: char"
            )

        budget = self.l_max - int(self.append_bos) - int(self.append_eos)
        tr_tokens = [list(t)[:budget] for t in tr_t]
        te_tokens = [list(t)[:budget] for t in te_t]

        counter: Counter = Counter()
        for toks in tr_tokens:
            counter.update(toks)
        specials = ["<pad>", "<unk>"]
        if self.append_bos:
            specials.append("<bos>")
        if self.append_eos:
            specials.append("<eos>")
        kept = [t for t, c in counter.most_common() if c >= self.min_freq]
        self.vocab = {t: i for i, t in enumerate(specials + kept)}
        self.vocab_size = len(self.vocab)
        self.pad_id = self.vocab["<pad>"]
        unk = self.vocab["<unk>"]

        def pack(token_lists) -> Tuple[np.ndarray, np.ndarray]:
            out = np.full((len(token_lists), self.l_max), self.pad_id, dtype=np.int64)
            lengths = np.zeros(len(token_lists), dtype=np.int64)
            for i, toks in enumerate(token_lists):
                ids = [self.vocab.get(t, unk) for t in toks]
                if self.append_bos:
                    ids = [self.vocab["<bos>"]] + ids
                if self.append_eos:
                    ids = ids + [self.vocab["<eos>"]]
                out[i, : len(ids)] = ids
                lengths[i] = len(ids)
            return out, lengths

        self.train_inputs, self.train_lengths = pack(tr_tokens)
        self.train_labels = tr_y
        self.test_inputs, self.test_lengths = pack(te_tokens)
        self.test_labels = te_y
        print(
            f"IMDB {self.level} | min_freq {self.min_freq} | vocab size "
            f"{self.vocab_size} | train {len(tr_y)} test {len(te_y)}"
        )
