"""WikiText-2 / WikiText-103 language modelling.

Pipeline parity with the reference (ref dataloaders/wikitext.py): GPT-2 BPE
tokenization, concatenate-and-chunk into fixed ``block_size`` blocks, labels
= next-token-shifted input ids with a −100 tail; metric = perplexity.

Offline behaviour (this environment has no egress):
  * a pre-tokenized cache (``tokens_{train,test}.npy`` under data_dir) is
    used when present — the canonical production path here;
  * raw HF datasets + the GPT-2 tokenizer are used when locally cached;
  * ``synthetic: true`` generates a Zipf-distributed token stream with the
    GPT-2 vocab size so the full pipeline (training, perplexity, analysis)
    stays exercisable offline.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from .base import SequenceDataset, perplexity

GPT2_VOCAB_SIZE = 50257


class WikiText(SequenceDataset):
    _name_ = "wikitext"

    @property
    def init_defaults(self):
        # ref dataloaders/wikitext.py:28-35
        return {
            "version": 2,
            "block_size": 1024,
            "seed": 42,
            "synthetic": False,
            "synthetic_train_tokens": 2_000_000,
            "synthetic_test_tokens": 200_000,
        }

    @property
    def l_max(self) -> int:
        return self.block_size

    @property
    def d_output(self) -> int:
        return GPT2_VOCAB_SIZE

    @property
    def vocab_size(self) -> int:
        return GPT2_VOCAB_SIZE

    def get_metrics(self, layer: str = "s4"):
        return perplexity

    # ------------------------------------------------------------------

    def _token_streams(self) -> Tuple[np.ndarray, np.ndarray]:
        data_dir = Path(self.data_dir) if self.data_dir else None
        if data_dir:
            tr, te = data_dir / "tokens_train.npy", data_dir / "tokens_test.npy"
            if tr.is_file() and te.is_file():
                return np.load(tr), np.load(te)

        if not self.synthetic:
            try:
                return self._tokenize_hf(data_dir)
            except Exception as exc:
                print(
                    f"WikiText-{self.version} | HF dataset/tokenizer unavailable "
                    f"({type(exc).__name__}); falling back to a synthetic "
                    "Zipf token stream (set dataset.synthetic: true to silence, "
                    "or place tokens_{train,test}.npy under data_dir)"
                )
        rng = np.random.default_rng(self.seed)

        def zipf_stream(n):
            # Zipf-ish rank distribution over the GPT-2 vocab
            u = rng.random(n)
            ranks = np.minimum(
                (1.0 / (u + 1e-6) ** 1.1).astype(np.int64), GPT2_VOCAB_SIZE - 1
            )
            return ranks

        return (
            zipf_stream(self.synthetic_train_tokens),
            zipf_stream(self.synthetic_test_tokens),
        )

    def _tokenize_hf(self, data_dir: Optional[Path]) -> Tuple[np.ndarray, np.ndarray]:
        from datasets import load_dataset
        from transformers import GPT2TokenizerFast

        name = f"wikitext-{self.version}-raw-v1"
        dataset = load_dataset(
            "Salesforce/wikitext", name,
            cache_dir=str(data_dir) if data_dir else None,
        )
        tokenizer = GPT2TokenizerFast.from_pretrained("gpt2")

        def stream(split):
            ids = []
            for enc in tokenizer(dataset[split]["text"])["input_ids"]:
                ids.extend(enc)
            return np.asarray(ids, dtype=np.int32)

        tr, te = stream("train"), stream("test")
        if data_dir:
            data_dir.mkdir(parents=True, exist_ok=True)
            np.save(data_dir / "tokens_train.npy", tr)
            np.save(data_dir / "tokens_test.npy", te)
        return tr, te

    def _chunk(self, stream: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Concat-and-chunk + shifted labels (ref wikitext.py:114-149)."""
        bs = self.block_size
        total = (len(stream) // bs) * bs
        inputs = stream[:total].reshape(-1, bs).astype(np.int64)
        labels = np.full_like(inputs, -100)
        labels[:, :-1] = inputs[:, 1:]
        return inputs, labels

    def setup(self) -> None:
        train_stream, test_stream = self._token_streams()
        self.train_inputs, self.train_labels = self._chunk(train_stream)
        self.test_inputs, self.test_labels = self._chunk(test_stream)
        print(
            f"WikiText-{self.version} | block {self.block_size} | "
            f"train blocks {len(self.train_inputs)} test {len(self.test_inputs)}"
        )
