"""Diagonal linear recurrence: h_t = a_t * h_{t-1} + b_t, parallel in time.

This is the compute core shared by LRU and S5 (and, specialised, by the
inter-chunk carries of the SSD kernel).  The reference drives it through
``jax.lax.associative_scan`` with a diagonal binary operator
(ref models/lru.py:10-19,95 and models/s5.py:51-93); here it is a
first-class op with three interchangeable implementations:

  * ``"scan"``   — sequential ``lax.scan`` oracle (ground truth for tests,
                   and the decode-mode recurrence, ref models/s4.py:82-88).
  * ``"assoc"``  — ``lax.associative_scan`` over the time axis (O(log L)
                   depth, XLA-fused; the portable default).
  * ``"pallas"`` — single fused Pallas TPU kernel (chunked Hillis-Steele
                   scan held in VMEM). See ``pallas_scan.py``.

Complex support: the target TPU backend has **no complex dtype at all**, so
complex recurrences are carried as (re, im) pairs of real arrays (see
``tlie_tpu.utils.cplx``).  Pass pairs for ``a``/``b`` and a pair comes back;
plain complex arrays also work for CPU-side oracles and are split
internally.

Shapes: time axis is ``axis`` (default -2) — typically ``(..., L, N)``;
``a`` and ``b`` broadcast against each other.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from ..utils import cplx

ArrayOrPair = Union[jax.Array, Tuple[jax.Array, jax.Array]]


def _is_pair(x) -> bool:
    return isinstance(x, tuple) and len(x) == 2


def _scan_sequential_real(a, b, axis, reverse):
    a = jnp.moveaxis(a, axis, 0)
    b = jnp.moveaxis(b, axis, 0)

    def step(h, ab):
        a_t, b_t = ab
        h = a_t * h + b_t
        return h, h

    init = jnp.zeros(jnp.broadcast_shapes(a.shape[1:], b.shape[1:]), dtype=b.dtype)
    _, hs = lax.scan(step, init, (a, b), reverse=reverse)
    return jnp.moveaxis(hs, 0, axis)


def _scan_sequential_pair(a, b, axis, reverse):
    a_re = jnp.moveaxis(a[0], axis, 0)
    a_im = jnp.moveaxis(a[1], axis, 0)
    b_re = jnp.moveaxis(b[0], axis, 0)
    b_im = jnp.moveaxis(b[1], axis, 0)

    def step(h, elems):
        ar, ai, br, bi = elems
        hr, hi = h
        nr = ar * hr - ai * hi + br
        ni = ar * hi + ai * hr + bi
        return (nr, ni), (nr, ni)

    shape = jnp.broadcast_shapes(a_re.shape[1:], b_re.shape[1:])
    init = (jnp.zeros(shape, b_re.dtype), jnp.zeros(shape, b_re.dtype))
    _, (h_re, h_im) = lax.scan(step, init, (a_re, a_im, b_re, b_im), reverse=reverse)
    return (jnp.moveaxis(h_re, 0, axis), jnp.moveaxis(h_im, 0, axis))


def _combine_real(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_r * a_l, a_r * b_l + b_r


def _combine_pair(left, right):
    # (decay, update) composition with complex decay, in real arithmetic
    alr, ali, blr, bli = left
    arr, ari, brr, bri = right
    a_re = arr * alr - ari * ali
    a_im = arr * ali + ari * alr
    b_re = arr * blr - ari * bli + brr
    b_im = arr * bli + ari * blr + bri
    return a_re, a_im, b_re, b_im


def _scan_associative_real(a, b, axis, reverse):
    a, b = jnp.broadcast_arrays(a, b.astype(jnp.result_type(a, b)))
    _, hs = lax.associative_scan(_combine_real, (a, b), axis=axis, reverse=reverse)
    return hs


def _scan_associative_pair(a, b, axis, reverse):
    elems = jnp.broadcast_arrays(a[0], a[1], b[0], b[1])
    out = lax.associative_scan(_combine_pair, tuple(elems), axis=axis, reverse=reverse)
    return (out[2], out[3])


# Sequence-parallel routing: when set (via ``sequence_parallel``), every
# diag_linear_scan traced in the region runs the device-mesh scan of
# parallel/sp.py instead of the single-device kernels — the config knob
# ``train.sequence_parallel: N`` (training/loop.py) enters this context
# around the model forward/backward trace.
_SP_STATE = None


class sequence_parallel:
    """Context manager: route diag_linear_scan over a ``seq`` device mesh.

    >>> with sequence_parallel(mesh):
    ...     y = model.apply(params, x)   # recurrences now span the mesh
    """

    def __init__(self, mesh, axis_name: str = "seq"):
        self.state = (mesh, axis_name)
        self._prev = None

    def __enter__(self):
        global _SP_STATE
        self._prev = _SP_STATE
        _SP_STATE = self.state
        return self

    def __exit__(self, *exc):
        global _SP_STATE
        _SP_STATE = self._prev
        return False


def diag_linear_scan(
    a: ArrayOrPair,
    b: ArrayOrPair,
    *,
    axis: int = -2,
    reverse: bool = False,
    impl: Optional[str] = None,
) -> ArrayOrPair:
    """Inclusive scan of ``h_t = a_t * h_{t-1} + b_t`` with ``h_{-1} = 0``.

    Args:
      a: decay factors — real array, complex array (CPU oracles only), or a
         (re, im) pair of real arrays; broadcastable against ``b``.
      b: recurrence inputs, likewise.
      axis: the time axis.
      reverse: scan right-to-left (bidirectional S5, ref models/s5.py:84-88).
      impl: "scan" | "assoc" | "pallas" | None (auto: pallas on TPU when
         eligible, else assoc).

    Returns:
      Hidden states with the broadcast shape — a pair if inputs were
      pairs/complex-split, else a real array; complex-array inputs return a
      complex array.
    """
    if _SP_STATE is not None:
        from ..parallel.sp import sp_diag_linear_scan

        mesh, axis_name = _SP_STATE
        return sp_diag_linear_scan(
            a, b, mesh, axis=axis, axis_name=axis_name, reverse=reverse
        )

    want_complex_array = False
    ndim = max((a[0] if _is_pair(a) else a).ndim, (b[0] if _is_pair(b) else b).ndim)
    if axis < 0:
        axis += ndim  # lax.rev (assoc reverse) requires nonnegative axes
    if _is_pair(a) or _is_pair(b):
        a, b = cplx.pair(a), cplx.pair(b)
        complex_mode = True
    elif jnp.iscomplexobj(a) or jnp.iscomplexobj(b):
        a, b = cplx.pair(a), cplx.pair(b)
        complex_mode = True
        want_complex_array = True
    else:
        complex_mode = False

    # Broadcast to a common shape up front so the time axis is unambiguous.
    if complex_mode:
        ar, ai, br, bi = jnp.broadcast_arrays(a[0], a[1], b[0], b[1])
        a, b = (ar, ai), (br, bi)
        shape = ar.shape
    else:
        a, b = jnp.broadcast_arrays(a, b.astype(jnp.result_type(a, b)))
        shape = a.shape

    if impl is None:
        impl = _default_impl(shape, axis, reverse)

    if impl == "scan":
        out = (
            _scan_sequential_pair(a, b, axis, reverse)
            if complex_mode
            else _scan_sequential_real(a, b, axis, reverse)
        )
    elif impl == "assoc":
        out = (
            _scan_associative_pair(a, b, axis, reverse)
            if complex_mode
            else _scan_associative_real(a, b, axis, reverse)
        )
    elif impl == "pallas":
        from .pallas_scan import pallas_diag_linear_scan

        out = pallas_diag_linear_scan(a, b, axis=axis, reverse=reverse)
    else:
        raise ValueError(f"Unknown scan impl {impl!r}")

    if want_complex_array:
        return cplx.to_complex(out)
    return out


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except RuntimeError:
        return False


def _default_impl(shape, axis, reverse) -> str:
    if not _on_tpu():
        return "assoc"
    try:
        from .pallas_scan import pallas_scan_eligible

        if pallas_scan_eligible(shape, axis, reverse):
            return "pallas"
    except Exception:
        pass
    return "assoc"
