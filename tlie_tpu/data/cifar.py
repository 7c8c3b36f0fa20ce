"""Sequential CIFAR-10 (and sequential MNIST): images as 1-D sequences.

Counterpart of the reference's torchvision pipeline
(ref dataloaders/basic.py:14-214), rebuilt as whole-dataset numpy
preprocessing: instead of per-sample torchvision transform stacks executed
in DataLoader workers, the full split is converted once (grayscale,
normalise, flatten, permute) into a contiguous array that then lives in
device HBM for the scanned trainer.

Data source: torchvision's CIFAR-10/MNIST binaries under ``data_dir``
(``download=False`` — this environment has no egress).  When absent and
``synthetic: true`` is set, a deterministic random image set stands in so
the full pipeline stays testable offline; otherwise a clear error explains
where to put the data.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from .base import SequenceDataset, argmax_accuracy
from .permutations import (
    bitreversal_permutation,
    hilbert_permutation,
    snake_permutation,
    transpose_permutation,
)

# ITU-R 601 luma weights — torchvision.transforms.Grayscale convention
_LUMA = np.array([0.2989, 0.587, 0.114], dtype=np.float32)


def _load_torchvision_cifar(data_dir: str) -> Optional[Tuple]:
    try:
        import torchvision

        root = str(data_dir)
        train = torchvision.datasets.CIFAR10(root, train=True, download=False)
        test = torchvision.datasets.CIFAR10(root, train=False, download=False)
        return (
            train.data.astype(np.float32) / 255.0,
            np.asarray(train.targets, dtype=np.int64),
            test.data.astype(np.float32) / 255.0,
            np.asarray(test.targets, dtype=np.int64),
        )
    except Exception:
        return None


def _class_templates(size: int, channels: int, num_classes: int = 10) -> np.ndarray:
    """Deterministic per-class cosine-grating templates in [0, 1].

    Class c gets a distinct (fx, fy) spatial frequency pair, so classes are
    separable from the flattened pixel sequence (and stay separable under
    the br/snake/hilbert permutations, which are bijections).  Shared by
    construction across train/test splits."""
    yy, xx = np.meshgrid(np.arange(size), np.arange(size), indexing="ij")
    out = np.zeros((num_classes, size, size, channels), dtype=np.float32)
    for c in range(num_classes):
        fx, fy = 1 + c % 5, 1 + 2 * (c // 5)
        for ch in range(channels):
            phase = 2.0 * np.pi * (c + ch) / num_classes
            out[c, ..., ch] = 0.5 + 0.5 * np.cos(
                2.0 * np.pi * (fx * xx + fy * yy) / size + phase
            )
    return out


def _synthetic_images(
    n: int, seed: int, size: int = 32, channels: int = 3
) -> Tuple[np.ndarray, np.ndarray]:
    """Class-conditional synthetic images: a class grating template blended
    with per-sample noise.  Learnable above chance by construction — the
    original uniform-noise stand-in had random labels, so 50-epoch runs
    measured chance accuracy and spectra of models that learned nothing."""
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 10, size=n).astype(np.int64)
    noise = rng.random((n, size, size, channels), dtype=np.float32)
    templates = _class_templates(size, channels)
    x = np.clip(0.55 * templates[y] + 0.45 * noise, 0.0, 1.0).astype(np.float32)
    return x, y


class CIFAR10(SequenceDataset):
    _name_ = "cifar"
    d_output = 10
    l_max = 32 * 32

    @property
    def init_defaults(self):
        # ref dataloaders/basic.py:73-85
        return {
            "permute": None,        # br | snake | hilbert | transpose | None
            "grayscale": False,
            "tokenize": False,
            "augment": False,
            "cutout": False,
            "val_split": 0.1,
            "seed": 42,
            "synthetic": False,
            "synthetic_train": 2048,
            "synthetic_test": 512,
        }

    @property
    def d_input(self) -> int:
        if self.grayscale:
            return 256 if self.tokenize else 1
        return 3

    def get_metrics(self, layer: str = "s4"):
        return argmax_accuracy

    def _preprocess(self, images: np.ndarray) -> np.ndarray:
        """(N, 32, 32, 3) floats in [0,1] → (N, 1024, d_input) sequences."""
        n = images.shape[0]
        if self.grayscale:
            x = images @ _LUMA  # (N, 32, 32)
            x = x.reshape(n, 1024, 1)
            if self.tokenize:
                x = np.round(x * 255.0).astype(np.int64)[..., 0]  # (N, L) tokens
            else:
                x = (x - 122.6 / 255.0) / (61.0 / 255.0)
        else:
            mean = np.array([0.4914, 0.4822, 0.4465], np.float32)
            std = np.array([0.247, 0.243, 0.261], np.float32)
            x = (images - mean) / std
            x = x.reshape(n, 1024, 3)

        if self.permute in ("br", "snake", "hilbert"):
            perm = {
                "br": lambda: bitreversal_permutation(1024),
                "snake": lambda: snake_permutation(32, 32),
                "hilbert": lambda: hilbert_permutation(32),
            }[self.permute]()
            x = x[:, perm]
        elif self.permute == "transpose":
            perm = transpose_permutation(32, 32)
            x = np.concatenate([x, x[:, perm]], axis=-1)
        return x

    def setup(self) -> None:
        loaded = None if self.synthetic else _load_torchvision_cifar(
            self.data_dir or "./data/cifar"
        )
        if loaded is None:
            if not self.synthetic:
                print(
                    "CIFAR-10 | torchvision binaries not found under "
                    f"{self.data_dir!r} and downloads are disabled; "
                    "falling back to synthetic images (set dataset.synthetic: "
                    "true to silence this)"
                )
            tr_x, tr_y = _synthetic_images(self.synthetic_train, self.seed)
            te_x, te_y = _synthetic_images(self.synthetic_test, self.seed + 1)
        else:
            tr_x, tr_y, te_x, te_y = loaded

        if self.augment:
            # one vectorised stochastic pass over the training split
            # (deviation: the reference redraws per epoch in DataLoader
            # workers; the scanned trainer consumes a fixed device-resident
            # epoch — call setup() again to redraw)
            from .augmentations import cutout, random_crop, random_hflip

            rng = np.random.default_rng(self.seed + 7)
            tr_x = random_hflip(random_crop(tr_x, rng), rng)
            if self.cutout:
                tr_x = cutout(tr_x, rng, n_holes=1, length=16)

        self.train_inputs = self._preprocess(tr_x)
        self.train_labels = tr_y
        self.test_inputs = self._preprocess(te_x)
        self.test_labels = te_y
        print(
            f"CIFAR-10 | {'gray' if self.grayscale else 'rgb'} | permute "
            f"{self.permute} | train {len(tr_y)} test {len(te_y)}"
        )


class MNIST(SequenceDataset):
    """Sequential / permuted MNIST (ref dataloaders/basic.py:14-64)."""

    _name_ = "mnist"
    d_output = 10
    l_max = 28 * 28

    @property
    def init_defaults(self):
        return {
            "permute": True,
            "val_split": 0.1,
            "seed": 42,
            "synthetic": False,
            "synthetic_train": 2048,
            "synthetic_test": 512,
        }

    d_input = 1

    def get_metrics(self, layer: str = "s4"):
        return argmax_accuracy

    def setup(self) -> None:
        data = None
        if not self.synthetic:
            try:
                import torchvision

                root = str(self.data_dir or "./data/mnist")
                tr = torchvision.datasets.MNIST(root, train=True, download=False)
                te = torchvision.datasets.MNIST(root, train=False, download=False)
                data = (
                    tr.data.numpy().astype(np.float32) / 255.0,
                    tr.targets.numpy().astype(np.int64),
                    te.data.numpy().astype(np.float32) / 255.0,
                    te.targets.numpy().astype(np.int64),
                )
            except Exception:
                data = None
        if data is None:
            tr_x, tr_y = _synthetic_images(self.synthetic_train, self.seed,
                                           size=28, channels=1)
            te_x, te_y = _synthetic_images(self.synthetic_test, self.seed + 1,
                                           size=28, channels=1)
            data = (tr_x[..., 0], tr_y, te_x[..., 0], te_y)
        tr_x, tr_y, te_x, te_y = data

        def seq(x):
            x = x.reshape(len(x), 784, 1)
            if self.permute:
                perm = bitreversal_permutation(784)
                x = x[:, perm]
            return x

        self.train_inputs, self.train_labels = seq(tr_x), tr_y
        self.test_inputs, self.test_labels = seq(te_x), te_y
