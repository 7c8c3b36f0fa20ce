"""IMDB sentiment classification, char- and word-level (LRA text task).

Pipeline parity with the reference (ref dataloaders/lra.py:28-190):
char- or word-level tokenization with a min-frequency vocab built on train,
<eos> appended, padded to l_max, binary labels; metric = accuracy.

Word level: the reference tokenizes through spacy ``en_core_web_sm``
(ref lra.py:122-124), which needs a downloaded model and is unavailable
offline.  This implementation uses torchtext's ``basic_english`` pipeline —
the standard torchtext word tokenizer (lowercase + a fixed regex
rule list + whitespace split) — transcribed below, with vocab construction
matching ``torchtext.vocab.build_vocab_from_iterator`` ordering exactly
(specials first, then tokens sorted by frequency descending with
lexicographic tie-break, ``min_freq`` filtered).  Documented deviation:
token boundaries differ from spacy's on contractions/punctuation edge
cases; the task semantics (word-level sentiment over a min-freq vocab) are
the same.

Offline sources, tried in order:
  1. HF ``imdb`` dataset locally cached under data_dir;
  2. plain-text folders ``{train,test}/{pos,neg}/*.txt`` under data_dir
     (the original aclImdb layout);
  3. ``synthetic: true`` → a generated corpus with class-dependent
     character statistics so the full pipeline remains exercisable offline
     (clearly labelled — not the real task).
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from .base import SequenceDataset, argmax_accuracy

# torchtext ``basic_english`` normalisation rules (pattern → replacement),
# applied in order after lowercasing; tokens are the whitespace splits.
_BASIC_ENGLISH_RULES = [
    (re.compile(p), r)
    for p, r in (
        (r"\'", " '  "),
        (r"\"", ""),
        (r"\.", " . "),
        (r"<br \/>", " "),
        (r",", " , "),
        (r"\(", " ( "),
        (r"\)", " ) "),
        (r"\!", " ! "),
        (r"\?", " ? "),
        (r"\;", " "),
        (r"\:", " "),
        (r"\s+", " "),
    )
]


def basic_english_tokenize(text: str) -> List[str]:
    """torchtext ``get_tokenizer("basic_english")`` equivalent."""
    text = text.lower()
    for pattern, repl in _BASIC_ENGLISH_RULES:
        text = pattern.sub(repl, text)
    return text.split()


def build_vocab(token_lists, min_freq: int, specials: List[str]) -> dict:
    """``torchtext.vocab.build_vocab_from_iterator`` ordering: specials
    first (special_first=True), then tokens with count ≥ min_freq by
    frequency descending, lexicographic tie-break."""
    counter: Counter = Counter()
    for toks in token_lists:
        counter.update(toks)
    items = sorted(counter.items())  # lexicographic
    items.sort(key=lambda kv: kv[1], reverse=True)  # stable: freq desc
    kept = [t for t, c in items if c >= min_freq]
    return {t: i for i, t in enumerate(specials + kept)}


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

        if self.level not in ("char", "word"):
            raise ValueError(f"level {self.level} not supported")
        tokenizer = list if self.level == "char" else basic_english_tokenize

        budget = self.l_max - int(self.append_bos) - int(self.append_eos)
        tr_tokens = [tokenizer(t)[:budget] for t in tr_t]
        te_tokens = [tokenizer(t)[:budget] for t in te_t]

        specials = ["<pad>", "<unk>"]
        if self.append_bos:
            specials.append("<bos>")
        if self.append_eos:
            specials.append("<eos>")
        self.vocab = build_vocab(tr_tokens, self.min_freq, specials)
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
