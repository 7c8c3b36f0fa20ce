"""Native (C++) runtime components, loaded via ctypes.

The reference leans on third-party native kernel libraries for compute; the
TPU compute path here is Pallas/XLA, but host-side data synthesis is native
C++ (csrc/) — built on demand with the system compiler into a cached shared
object, no pybind11 required.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_CSRC = Path(__file__).resolve().parent.parent.parent / "csrc"
_BUILD = Path(__file__).resolve().parent / "_build"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile(name: str, sources) -> Optional[Path]:
    _BUILD.mkdir(parents=True, exist_ok=True)
    out = _BUILD / f"{name}.so"
    srcs = [str(_CSRC / s) for s in sources]
    newest_src = max(os.path.getmtime(s) for s in srcs)
    if out.exists() and os.path.getmtime(out) >= newest_src:
        return out
    for flags in (["-fopenmp"], []):  # OpenMP if available
        cmd = (
            ["c++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC"]
            + flags + srcs + ["-o", str(out)]
        )
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return out
        except (subprocess.CalledProcessError, FileNotFoundError):
            continue
    return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    so = _compile("tlie_native", ["mqar_gen.cpp", "listops_gen.cpp"])
    if so is None:
        _build_failed = True
        return None
    lib = ctypes.CDLL(str(so))
    lib.mqar_generate.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_uint64, ctypes.c_int,
    ]
    lib.mqar_generate.restype = None
    lib.listops_generate.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_uint64, ctypes.c_int,
    ]
    lib.listops_generate.restype = None
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def mqar_generate_native(
    vocab_size: int,
    num_examples: int,
    input_seq_len: int,
    seed: int,
    power_a: float = 0.01,
    num_kv_pairs: int = 8,
    random_non_queries: bool = True,
):
    """C++ MQAR synthesis; returns (inputs, labels) int64 (N, L) arrays,
    or None when no compiler is available."""
    lib = _load()
    if lib is None:
        return None
    inputs = np.empty((num_examples, input_seq_len), dtype=np.int64)
    labels = np.empty((num_examples, input_seq_len), dtype=np.int64)
    lib.mqar_generate(
        inputs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        num_examples, input_seq_len, vocab_size, num_kv_pairs,
        power_a, seed, int(random_non_queries),
    )
    return inputs, labels


#: canonical ListOps token ids emitted by csrc/listops_gen.cpp
LISTOPS_TOKENS = tuple(str(d) for d in range(10)) + (
    "[MIN", "[MAX", "[MED", "[SM", "X",
)


def listops_generate_native(
    n: int,
    seed: int,
    min_length: int = 500,
    max_length: int = 2000,
    l_max: int = 2048,
    max_depth: int = 10,
    max_args: int = 10,
    threads: int = 0,
):
    """C++ ListOps growth-scheme synthesis (csrc/listops_gen.cpp).

    Returns (tokens (N, l_max) int32 canonical ids padded with -1,
    lengths (N,) int32, targets (N,) int64), or None when no compiler is
    available.  Canonical id i ↔ ``LISTOPS_TOKENS[i]``; same vocabulary,
    operator semantics, length window and depth cap as the Python
    generator (data/listops.py::generate_listops_by_growth) — ~100×
    faster (the Python path measured 118 examples/s; the 96k reference
    split is ~14 min there)."""
    lib = _load()
    if lib is None:
        return None
    tokens = np.empty((n, l_max), dtype=np.int32)
    lengths = np.empty((n,), dtype=np.int32)
    targets = np.empty((n,), dtype=np.int64)
    lib.listops_generate(
        tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        targets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n, l_max, min_length, max_length, max_depth, max_args, seed, threads,
    )
    return tokens, lengths, targets
