"""Fused Pallas TPU kernel for the diagonal linear recurrence.

Computes ``h_t = a_t * h_{t-1} + b_t`` (inclusive, zero initial state) in a
single kernel: the sequence is tiled into VMEM-resident chunks, each chunk is
scanned with a log-depth Hillis-Steele doubling pass on the VPU, and the
inter-chunk carry lives in a VMEM scratch that persists across the
(sequentially executed) grid steps.  Complex recurrences — the LRU / S5 case,
ref models/lru.py:88-95 and models/s5.py:78-82 — are carried as separate
real/imag planes: the target TPU backend has no complex dtype anywhere.

Compared to ``lax.associative_scan`` this fuses the O(log L) combine passes
into one HBM round-trip instead of materialising each pass.

The op is differentiable: the VJP of a linear scan is itself a (reversed,
conjugated) linear scan, so the backward pass reuses the same kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 256
_LANE = 128


def pallas_scan_eligible(shape: Tuple[int, ...], axis: int, reverse: bool) -> bool:
    """Static check: shapes the fused kernel supports without padding."""
    del reverse  # handled by flipping outside the kernel
    if len(shape) < 2 or axis not in (-2, len(shape) - 2):
        return False
    L, N = shape[-2], shape[-1]
    if N % _LANE != 0:
        return False
    chunk = min(_CHUNK, L)
    return L % chunk == 0


def _chunk_scan_body(comps, chunk: int):
    """One chunk: Hillis-Steele inclusive scan of (decay, update) pairs.

    ``comps`` is ((A_re, A_im), (B_re, B_im)) with A_im/B_im None for the
    real case.  Arrays are (chunk, N).  Returns the scanned (A, B): A is the
    cumulative decay prefix-product, B the zero-init scan of the inputs.
    """
    (A_re, A_im), (B_re, B_im) = comps
    is_complex = A_im is not None
    d = 1
    while d < chunk:
        ones = jnp.ones_like(A_re[:d])
        zeros = jnp.zeros_like(A_re[:d])
        pA_re = jnp.concatenate([ones, A_re[:-d]], axis=0)
        pB_re = jnp.concatenate([zeros, B_re[:-d]], axis=0)
        if is_complex:
            pA_im = jnp.concatenate([zeros, A_im[:-d]], axis=0)
            pB_im = jnp.concatenate([zeros, B_im[:-d]], axis=0)
            nA_re = A_re * pA_re - A_im * pA_im
            nA_im = A_re * pA_im + A_im * pA_re
            nB_re = B_re + A_re * pB_re - A_im * pB_im
            nB_im = B_im + A_re * pB_im + A_im * pB_re
            A_re, A_im, B_re, B_im = nA_re, nA_im, nB_re, nB_im
        else:
            A_re, B_re = A_re * pA_re, B_re + A_re * pB_re
        d *= 2
    return (A_re, A_im), (B_re, B_im)


def _complex_kernel(a_re_ref, a_im_ref, b_re_ref, b_im_ref,
                    h_re_ref, h_im_ref, carry_ref, *, chunk: int):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    comps = ((a_re_ref[0], a_im_ref[0]), (b_re_ref[0], b_im_ref[0]))
    (A_re, A_im), (B_re, B_im) = _chunk_scan_body(comps, chunk)

    c_re = carry_ref[0]
    c_im = carry_ref[1]
    h_re = B_re + A_re * c_re - A_im * c_im
    h_im = B_im + A_re * c_im + A_im * c_re
    h_re_ref[0] = h_re
    h_im_ref[0] = h_im
    carry_ref[0] = h_re[-1:]
    carry_ref[1] = h_im[-1:]


def _real_kernel(a_ref, b_ref, h_ref, carry_ref, *, chunk: int):
    ci = pl.program_id(1)

    @pl.when(ci == 0)
    def _():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    (A, _), (B, _) = _chunk_scan_body(((a_ref[0], None), (b_ref[0], None)), chunk)
    h = B + A * carry_ref[0]
    h_ref[0] = h
    carry_ref[0] = h[-1:]


def _run_scan_planes(planes):
    """planes: 2 or 4 equal-shape (B, L, N) float arrays — (a, b) or
    (a_re, a_im, b_re, b_im).  One fused pallas_call."""
    B, L, N = planes[0].shape
    dtype = planes[0].dtype
    chunk = min(_CHUNK, L)
    n_chunks = L // chunk
    is_complex = len(planes) == 4
    n_out = 2 if is_complex else 1

    spec = pl.BlockSpec(
        (1, chunk, N), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _complex_kernel if is_complex else _real_kernel, chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_chunks),
        in_specs=[spec] * len(planes),
        out_specs=tuple([spec] * n_out) if is_complex else spec,
        out_shape=(
            tuple(jax.ShapeDtypeStruct((B, L, N), dtype) for _ in range(n_out))
            if is_complex
            else jax.ShapeDtypeStruct((B, L, N), dtype)
        ),
        scratch_shapes=[pltpu.VMEM((n_out, 1, N), dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(*planes)


# --------------------------------------------------------------------------
# Differentiable cores.  VJP of a linear scan: with cotangent g_t on h_t,
#   d_t = conj(a_{t+1}) d_{t+1} + g_t   (reverse scan, d_L = 0)
#   db_t = d_t ,   da_t = d_t * conj(h_{t-1})
# --------------------------------------------------------------------------


def _shift_fwd(x):
    """x_{t+1} with zero fill at the end (along axis 1)."""
    return jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)


def _shift_bwd(x):
    """x_{t-1} with zero fill at the start (along axis 1)."""
    return jnp.concatenate([jnp.zeros_like(x[:, :1]), x[:, :-1]], axis=1)


def _flip(x):
    return jnp.flip(x, axis=1)


@jax.custom_vjp
def _scan_core_real(a, b):
    return _run_scan_planes((a, b))


def _scan_core_real_fwd(a, b):
    h = _scan_core_real(a, b)
    return h, (a, h)


def _scan_core_real_bwd(res, g):
    a, h = res
    a_next = _shift_fwd(a)
    d = _flip(_scan_core_real(_flip(a_next), _flip(g)))
    da = d * _shift_bwd(h)
    return da, d


_scan_core_real.defvjp(_scan_core_real_fwd, _scan_core_real_bwd)


@jax.custom_vjp
def _scan_core_pair(a_re, a_im, b_re, b_im):
    return _run_scan_planes((a_re, a_im, b_re, b_im))


def _scan_core_pair_fwd(a_re, a_im, b_re, b_im):
    h_re, h_im = _scan_core_pair(a_re, a_im, b_re, b_im)
    return (h_re, h_im), (a_re, a_im, h_re, h_im)


def _scan_core_pair_bwd(res, g):
    a_re, a_im, h_re, h_im = res
    g_re, g_im = g
    # reverse scan with conj(a_{t+1}) decay
    ar = _flip(_shift_fwd(a_re))
    ai = _flip(-_shift_fwd(a_im))
    d_re, d_im = _scan_core_pair(ar, ai, _flip(g_re), _flip(g_im))
    d_re, d_im = _flip(d_re), _flip(d_im)
    # da_t = d_t * conj(h_{t-1})
    hp_re, hp_im = _shift_bwd(h_re), _shift_bwd(h_im)
    da_re = d_re * hp_re + d_im * hp_im
    da_im = d_im * hp_re - d_re * hp_im
    return da_re, da_im, d_re, d_im


_scan_core_pair.defvjp(_scan_core_pair_fwd, _scan_core_pair_bwd)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


def _normalise(x, shape, axis):
    x = jnp.broadcast_to(x, shape)
    x = jnp.moveaxis(x, axis, -2)
    return x.reshape((-1,) + x.shape[-2:])


def pallas_diag_linear_scan(a, b, *, axis: int = -2, reverse: bool = False):
    """Fused scan on real arrays or (re, im) pairs; see ops.scan for the
    calling convention."""
    is_pair = isinstance(a, tuple)
    if is_pair:
        shape = jnp.broadcast_shapes(a[0].shape, b[0].shape)
        lead = shape[:-2]
        planes = [_normalise(p, shape, axis) for p in (*a, *b)]
        if reverse:
            planes = [_flip(p) for p in planes]
        h_re, h_im = _scan_core_pair(*planes)
        if reverse:
            h_re, h_im = _flip(h_re), _flip(h_im)
        out_shape = lead + shape[-2:]
        h_re = jnp.moveaxis(h_re.reshape(out_shape), -2, axis)
        h_im = jnp.moveaxis(h_im.reshape(out_shape), -2, axis)
        return (h_re, h_im)

    dtype = jnp.result_type(a, b)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    lead = shape[:-2]
    a3 = _normalise(a.astype(dtype), shape, axis)
    b3 = _normalise(b.astype(dtype), shape, axis)
    if reverse:
        a3, b3 = _flip(a3), _flip(b3)
    h = _scan_core_real(a3, b3)
    if reverse:
        h = _flip(h)
    return jnp.moveaxis(h.reshape(lead + shape[-2:]), -2, axis)
