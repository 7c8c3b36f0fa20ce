"""LRA PathFinder: are two dots connected by a dashed path?

Counterpart of ref dataloaders/lra.py:393-537: 32×32 grayscale PNGs from
lra_release's ``pathfinder32/curv_contour_length_14`` tree (metadata files
map image → label), flattened to length-1024 sequences, optionally centered.

Offline fallback: a synthetic generator that draws a dashed random walk
between two endpoint dots on a 32×32 canvas, connected (label 1) or split
into two disjoint arcs (label 0) — geometrically faithful to the task even
though it is not the LRA distribution; local lra_release files are used
verbatim when present.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Tuple

import numpy as np

from .base import SequenceDataset, argmax_accuracy


def _draw_walk(rng, canvas, start, n_steps, dash=3):
    """Dashed random walk; returns the end point."""
    pos = np.array(start, dtype=np.int64)
    direction = rng.integers(0, 4)
    for step in range(n_steps):
        if rng.random() < 0.3:
            direction = rng.integers(0, 4)
        d = [(0, 1), (1, 0), (0, -1), (-1, 0)][direction]
        pos = np.clip(pos + d, 1, canvas.shape[0] - 2)
        if (step // dash) % 2 == 0:  # dashes
            canvas[pos[0], pos[1]] = 1.0
    return pos


def _synthetic_pathfinder(n: int, seed: int, size: int = 32):
    rng = np.random.default_rng(seed)
    xs = np.zeros((n, size, size), dtype=np.float32)
    ys = np.zeros(n, dtype=np.int64)
    for i in range(n):
        connected = int(rng.integers(0, 2))
        canvas = xs[i]
        start = rng.integers(2, size - 2, size=2)
        if connected:
            end = _draw_walk(rng, canvas, start, n_steps=60)
            canvas[start[0], start[1]] = 1.0
            canvas[end[0], end[1]] = 1.0
        else:
            mid1 = _draw_walk(rng, canvas, start, n_steps=25)
            other = rng.integers(2, size - 2, size=2)
            _draw_walk(rng, canvas, other, n_steps=25)
            canvas[start[0], start[1]] = 1.0
            canvas[mid1[0], mid1[1]] = 1.0
        # distractor arcs
        for _ in range(2):
            _draw_walk(rng, canvas, rng.integers(2, size - 2, size=2), n_steps=15)
        ys[i] = connected
    return xs, ys


def _load_lra_pathfinder(data_dir: Path, resolution: int):
    """Read images+labels from the lra_release metadata layout
    (ref lra.py:400-440); returns None when absent or PIL unavailable."""
    try:
        from PIL import Image
    except ImportError:
        return None
    diff = data_dir / "curv_contour_length_14"
    meta_dir = diff / "metadata"
    if not meta_dir.is_dir():
        return None
    samples: List[Tuple[Path, int]] = []
    for metadata_file in sorted(meta_dir.glob("*.npy"), key=lambda p: int(p.stem)):
        for line in metadata_file.read_text().splitlines():
            parts = line.split()
            samples.append((diff / parts[0] / parts[1], int(parts[3])))
    xs = np.zeros((len(samples), resolution, resolution), dtype=np.float32)
    ys = np.zeros(len(samples), dtype=np.int64)
    for i, (path, label) in enumerate(samples):
        with open(path, "rb") as f:
            xs[i] = np.asarray(Image.open(f).convert("L"), dtype=np.float32) / 255.0
        ys[i] = label
    return xs, ys


class PathFinder(SequenceDataset):
    _name_ = "pathfinder"
    d_input = 1
    d_output = 2

    @property
    def init_defaults(self):
        # ref dataloaders/lra.py:463-475
        return {
            "resolution": 32,
            "sequential": True,
            "center": True,
            "val_split": 0.1,
            "test_split": 0.1,
            "seed": 42,
            "synthetic": False,
            "synthetic_train": 1024,
            "synthetic_test": 256,
        }

    @property
    def l_max(self) -> int:
        return self.resolution * self.resolution

    def get_metrics(self, layer: str = "s4"):
        return argmax_accuracy

    def setup(self) -> None:
        loaded = None
        if self.data_dir and not self.synthetic:
            loaded = _load_lra_pathfinder(Path(self.data_dir), self.resolution)
        if loaded is None:
            if not self.synthetic:
                print(
                    f"PathFinder | no lra_release data under {self.data_dir!r}; "
                    "using the synthetic connected-path generator"
                )
            tr_x, tr_y = _synthetic_pathfinder(self.synthetic_train, self.seed,
                                               self.resolution)
            te_x, te_y = _synthetic_pathfinder(self.synthetic_test, self.seed + 1,
                                               self.resolution)
        else:
            xs, ys = loaded
            rng = np.random.default_rng(self.seed)
            order = rng.permutation(len(xs))
            n_test = int(len(xs) * self.test_split)
            te_idx, tr_idx = order[:n_test], order[n_test:]
            tr_x, tr_y = xs[tr_idx], ys[tr_idx]
            te_x, te_y = xs[te_idx], ys[te_idx]

        def seq(x):
            x = x.reshape(len(x), -1, 1)
            if self.center:
                x = x - 0.5
            return x

        self.train_inputs, self.train_labels = seq(tr_x), tr_y
        self.test_inputs, self.test_labels = seq(te_x), te_y
        print(f"PathFinder | res {self.resolution} | train {len(tr_y)} test {len(te_y)}")
