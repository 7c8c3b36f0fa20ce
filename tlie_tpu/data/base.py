"""Dataset base: registry, host-array batching, device-resident feeding.

API parity with the reference's ``SequenceDataset`` contract
(ref dataloaders/base.py:159-231): ``registry[_name_](**cfg)``, ``setup()``,
``train_dataloader(batch_size, shuffle)`` / ``test_dataloader(...)``, and the
attributes ``l_max`` / ``d_output`` the launcher reads.  The machinery is
redesigned TPU-first:

  * No torch ``DataLoader`` / worker processes — task data here is small,
    synthetic, or memory-mapped; batches are sliced from contiguous host
    numpy arrays (zero-copy views) and pushed to device with
    ``jax.device_put`` against an explicit ``Sharding``, so the trainer sees
    device-resident, pre-sharded ``jnp`` arrays.
  * Static shapes only: batches are padded to ``l_max`` and short final
    batches are dropped (jit recompiles on shape changes).
  * Metric closures are dataset-supplied jax functions
    (ref get_metrics contract, e.g. dataloaders/mqar.py:161-171).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Batch = Tuple[Any, Any, Dict[str, Any]]


class HostArrayLoader:
    """Iterates minibatches over contiguous host arrays, optionally
    device-putting them with a sharding.  Yields (x, y, aux) like the
    reference's collated loaders."""

    def __init__(
        self,
        inputs: np.ndarray,
        labels: np.ndarray,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        lengths: Optional[np.ndarray] = None,
        aux_static: Optional[Dict[str, Any]] = None,
        drop_last: bool = True,
        sharding: Optional[jax.sharding.Sharding] = None,
    ):
        self.inputs = inputs
        self.labels = labels
        self.lengths = lengths
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.aux_static = aux_static or {}
        self.sharding = sharding
        self._rng = np.random.default_rng(seed)
        n = len(inputs)
        self._n_batches = n // batch_size if drop_last else -(-n // batch_size)

    def __len__(self) -> int:
        return self._n_batches

    def _put(self, arr: np.ndarray):
        if self.sharding is not None:
            return jax.device_put(arr, self.sharding)
        return arr

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.inputs)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        for i in range(self._n_batches):
            idx = order[i * self.batch_size : (i + 1) * self.batch_size]
            x = self._put(self.inputs[idx])
            y = self._put(self.labels[idx])
            aux = dict(self.aux_static)
            if self.lengths is not None:
                aux["lengths"] = self.lengths[idx]
            yield x, y, aux


class SequenceDataset:
    """Registry base (auto-registration via ``__init_subclass__``, matching
    the reference's subclass-registration contract)."""

    registry: Dict[str, type] = {}
    _name_: str = ""

    #: subclasses override — defaults merged with constructor kwargs
    @property
    def init_defaults(self) -> Dict[str, Any]:
        return {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if cls._name_:
            SequenceDataset.registry[cls._name_] = cls

    def __init__(self, _name_: Optional[str] = None, data_dir: Optional[str] = None, **cfg):
        if _name_ is not None and _name_ != self._name_:
            raise ValueError(f"Dataset name mismatch: {_name_} != {self._name_}")
        self.data_dir = data_dir or None
        merged = dict(self.init_defaults)
        merged.update(cfg)
        for k, v in merged.items():
            setattr(self, k, v)
        # populated by setup()
        self.train_inputs: Optional[np.ndarray] = None
        self.train_labels: Optional[np.ndarray] = None
        self.test_inputs: Optional[np.ndarray] = None
        self.test_labels: Optional[np.ndarray] = None
        self.train_lengths: Optional[np.ndarray] = None
        self.test_lengths: Optional[np.ndarray] = None

    # -- required interface -------------------------------------------------
    #: subclasses must provide l_max (max sequence length) and d_output
    #: (number of classes / vocab) as attributes or properties
    l_max: int = None  # type: ignore[assignment]
    d_output: int = None  # type: ignore[assignment]

    def setup(self) -> None:
        raise NotImplementedError

    def get_metrics(self, layer: str = "s4"):
        """Return a jax metric closure ``f(logits, labels) -> scalar``.

        Single code path for every model family — the torch/jax split of the
        reference (ref dataloaders/mqar.py:161-171) is gone."""
        raise NotImplementedError

    # -- loader construction ------------------------------------------------
    def _loader(self, split: str, batch_size: int, shuffle: bool, **kw) -> HostArrayLoader:
        inputs = getattr(self, f"{split}_inputs")
        labels = getattr(self, f"{split}_labels")
        lengths = getattr(self, f"{split}_lengths", None)
        if inputs is None:
            raise RuntimeError(f"Dataset {self._name_}: call setup() first")
        aux = {}
        if lengths is None:
            aux["lengths"] = self.l_max
        return HostArrayLoader(
            inputs, labels, batch_size, shuffle=shuffle,
            seed=getattr(self, "seed", 0),
            lengths=lengths, aux_static=aux, **kw,
        )

    def train_dataloader(self, batch_size: int, shuffle: bool = True, **kw):
        return self._loader("train", batch_size, shuffle, **kw)

    def test_dataloader(self, batch_size: int, shuffle: bool = False, **kw):
        return self._loader("test", batch_size, shuffle, **kw)

    # alias kept for reference-API completeness
    def val_dataloader(self, batch_size: int, shuffle: bool = False, **kw):
        return self.test_dataloader(batch_size, shuffle, **kw)

    @property
    def dataset_train(self):
        """len()-able handle (the launcher records train_size,
        ref launch.py:147)."""
        return self.train_inputs

    def __str__(self) -> str:
        return self._name_


def masked_accuracy(logits, labels, ignore_idx: int = -100):
    """Accuracy over positions whose label != ignore_idx (MQAR metric,
    ref dataloaders/mqar.py:171)."""
    pred = jnp.argmax(logits, axis=-1)
    mask = labels != ignore_idx
    correct = jnp.where(mask, pred == labels, False)
    return jnp.sum(correct) / jnp.maximum(jnp.sum(mask), 1)


def argmax_accuracy(logits, labels):
    return jnp.mean(jnp.argmax(logits, axis=-1) == labels)


def perplexity(logits, labels, ignore_idx: int = -100):
    """exp(mean CE) over non-ignored positions (ref dataloaders/wikitext.py:51-55)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe_labels = jnp.maximum(labels, 0)
    ll = jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    mask = labels != ignore_idx
    ce = -jnp.sum(jnp.where(mask, ll, 0.0)) / jnp.maximum(jnp.sum(mask), 1)
    return jnp.exp(ce)
