"""Hashable frozen config mapping.

Model modules carry their raw config dict as a flax attribute; jit treats
modules as static arguments, which requires hashability.  This wraps a dict
(recursively) into an immutable Mapping with a stable hash.
"""

from __future__ import annotations

from collections.abc import Mapping
from typing import Any, Dict


class FrozenCfg(Mapping):
    __slots__ = ("_data", "_hash")

    def __init__(self, data: Dict[str, Any]):
        object.__setattr__(self, "_data", {k: _freeze(v) for k, v in data.items()})
        object.__setattr__(self, "_hash", None)

    def __getitem__(self, key):
        return self._data[key]

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def __hash__(self):
        if self._hash is None:
            object.__setattr__(
                self, "_hash", hash(tuple(sorted(self._data.items(), key=lambda kv: kv[0])))
            )
        return self._hash

    def __eq__(self, other):
        if isinstance(other, FrozenCfg):
            return self._data == other._data
        if isinstance(other, Mapping):
            return self._data == dict(other)
        return NotImplemented

    def __repr__(self):
        return f"FrozenCfg({self._data!r})"


def _freeze(v):
    if isinstance(v, Mapping):
        return FrozenCfg(dict(v))
    if isinstance(v, list):
        return tuple(_freeze(x) for x in v)
    return v


def freeze_config(cfg) -> FrozenCfg:
    return cfg if isinstance(cfg, FrozenCfg) else FrozenCfg(dict(cfg))
