"""Real-format ingestion pinned by checked-in miniature fixtures.

This environment is offline, so the full-budget runs use synthetic
stand-ins — these tests keep the REAL-file ingestion branches from being
dead code (VERDICT r2 item 8): miniature fixtures in the exact on-disk
formats the reference consumes drive the same loaders end-to-end with
golden expectations.

  * LRA ListOps release TSVs (``Source``/``Target`` header —
    ref dataloaders/lra.py:238-391)
  * lra_release PathFinder tree (PNG images + text ``metadata/*.npy``
    rows — ref dataloaders/lra.py:393-537)
  * pre-tokenized WikiText streams (``tokens_{train,test}.npy``)
  * the original aclImdb ``{train,test}/{pos,neg}/*.txt`` folder layout
"""

import os

import numpy as np
import pytest

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_listops_reads_lra_tsvs():
    from tlie_tpu.data import ListOps
    from tlie_tpu.data.listops import listops_tokenizer

    ds = ListOps(data_dir=os.path.join(FIX, "listops"), l_max=64)
    ds.setup()
    assert ds.train_inputs.shape == (8, 64)
    assert ds.test_inputs.shape == (4, 64)
    # labels come straight from the Target column
    np.testing.assert_array_equal(ds.train_labels, [4, 2, 5, 1, 5, 3, 3, 2])
    np.testing.assert_array_equal(ds.test_labels, [3, 5, 8, 4])

    # golden tokenization of row 0: "[MAX 4 3 [MIN 2 3 ] 1 0 ]"
    # LRA pipeline: "]" → "X", parens dropped, whitespace split
    toks = listops_tokenizer("[MAX 4 3 [MIN 2 3 ] 1 0 ]")
    assert toks == ["[MAX", "4", "3", "[MIN", "2", "3", "X", "1", "0", "X"]
    ids = [ds.vocab[t] for t in toks] + [ds.vocab["<eos>"]]
    np.testing.assert_array_equal(ds.train_inputs[0, : len(ids)], ids)
    assert (ds.train_inputs[0, len(ids):] == ds.vocab["<pad>"]).all()
    assert int(ds.train_lengths[0]) == len(ids)


def test_pathfinder_reads_lra_release_pngs():
    pytest.importorskip("PIL")
    from tlie_tpu.data import PathFinder

    ds = PathFinder(
        data_dir=os.path.join(FIX, "pathfinder"),
        resolution=32, test_split=0.25, seed=3, center=False,
    )
    ds.setup()
    assert ds.train_inputs.shape == (3, 1024, 1)
    assert ds.test_inputs.shape == (1, 1024, 1)
    # pixel golden: each fixture image i has row i at 255 and column i at 128
    all_x = np.concatenate([ds.train_inputs, ds.test_inputs]).reshape(-1, 32, 32)
    all_y = np.concatenate([ds.train_labels, ds.test_labels])
    assert len(all_x) == 4 and set(all_y) == {0, 1}
    # identify each sample by its bright row; verify exact normalised pixels
    seen = set()
    for img, label in zip(all_x, all_y):
        i = int(np.argmax(img.max(axis=1)))
        seen.add(i)
        assert label == i % 2  # metadata column 3
        expected = np.zeros((32, 32), dtype=np.float32)
        expected[i, :] = 255.0
        expected[:, i] = 128.0  # column write wins at the intersection
        np.testing.assert_allclose(img, expected / 255.0, atol=1e-6)
    assert seen == {0, 1, 2, 3}


def test_wikitext_reads_pretokenized_streams():
    from tlie_tpu.data import WikiText

    ds = WikiText(data_dir=os.path.join(FIX, "wikitext"), block_size=16)
    ds.setup()
    stream = (np.arange(70, dtype=np.int64) * 7) % 50257
    assert ds.train_inputs.shape == (4, 16)  # 70 tokens → 4 full blocks
    np.testing.assert_array_equal(ds.train_inputs, stream[:64].reshape(4, 16))
    # labels: next-token shifted with a −100 tail (ref wikitext.py:139-149)
    np.testing.assert_array_equal(ds.train_labels[:, :-1], ds.train_inputs[:, 1:])
    assert (ds.train_labels[:, -1] == -100).all()
    assert ds.test_inputs.shape == (2, 16)


def test_imdb_reads_aclimdb_folder_layout():
    from tlie_tpu.data import IMDB

    ds = IMDB(data_dir=os.path.join(FIX, "aclImdb"), l_max=64, min_freq=1)
    ds.setup()
    # 2 pos + 2 neg per split, pos listed first (label 1)
    np.testing.assert_array_equal(ds.train_labels, [1, 1, 0, 0])
    np.testing.assert_array_equal(ds.test_labels, [1, 1, 0, 0])
    # char-level golden for train/pos/0.txt = "a fine film. loved it!"
    text = "a fine film. loved it!"
    ids = [ds.vocab[c] for c in text] + [ds.vocab["<eos>"]]
    np.testing.assert_array_equal(ds.train_inputs[0, : len(ids)], ids)
    assert int(ds.train_lengths[0]) == len(ids)
