"""Flash-style Pallas kernel for the SSD intra-chunk decay attention.

The full-sequence (C==1) arm of the chunked SSD scan (ops/ssd.py) is a
causally-masked "decay attention":

    y[i, h] = sum_{j<=i} (C_i . B_j) * exp(cs[i,h] - cs[j,h]) * xdt[j, h]

with C/B shared across the heads of a group.  The XLA path materialises the
(L, L, Hg) score tensor in HBM (134 MB bf16 per layer-step at the WikiText
shapes, written forward and re-read/re-written in the backward); this kernel
tiles the computation in VMEM exactly like flash attention — no online
softmax bookkeeping is needed because the decay weights are bounded in
(0, 1] (cs is a cumsum of dt*A with A < 0, so cs_i - cs_j <= 0 for i >= j)
— and never writes the score matrix to HBM.

Replaces the HBM-bound portion of the reference's Triton
``mamba_chunk_scan_combined`` (ref models/mamba.py:138-150) at LM shapes.
Backward follows the flash-attention split: one i-indexed kernel for
(dC, +dcs_i) and one j-indexed kernel for (dB, dxdt, -dcs_j).

Layouts (chosen so every per-head access indexes leading dims, which Mosaic
tiles freely — the lane dim is always N or P):
  C, B: (BG, L, N)     cs: (BG, Hg, L) f32     xdt, y, dy: (BG, Hg, L, P)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sequence tile edge.  256 was the round-4 shipping value; TLIE_SSD_TILE
# overrides for on-chip A/Bs (512 quarters the number of grid steps and cuts
# ~40% of the B/C/x tile re-fetch traffic at L1024 while staying within the
# VMEM gate — see eligible()).  Read once at import, like the kernel opt-in.
_TILE = int(os.environ.get("TLIE_SSD_TILE", "256"))


def eligible(L: int, N: int, P: int, Hg: int = 8) -> bool:
    """Static shape gate (Mosaic tiling constraints + VMEM budget) + env
    opt-in.

    OPT-IN: the kernel runs only under ``TLIE_SSD_INTRA=pallas`` (interpret
    mode off-TPU, for tests).  The on-chip A/B at the WikiText bf16 shapes
    (tools/profile_wikitext_layers.py 30 6 bf16, round 4) measured the
    kernel at 32.72 steps/s vs 33.93 for the XLA scores path at the same
    commit — XLA's fused producer wins despite materialising the (Q, Q, Hg)
    scores in HBM, and the kernel's cold Mosaic compile costs ~10 min
    through the axon tunnel — so the XLA path is the default
    (RESULTS.md round-4 A/B table).

    The env var and backend are read at TRACE time: a jitted caller bakes
    the choice into its compiled executable, so flipping the env after the
    first step of a cached train step has no effect for that process.

    ``Hg`` is heads-per-group: the kernels hold (Hg, T, P) f32 scratch and
    unroll an Hg-long per-head loop, so many heads per group would blow
    VMEM / compile time — bound the estimated VMEM working set instead of
    silently compiling a doomed kernel.
    """
    mode = os.environ.get("TLIE_SSD_INTRA", "").lower()
    if mode != "pallas":
        return False
    t = min(_TILE, L)
    if not (L % t == 0 and L >= 128 and N % 128 == 0 and P % 64 == 0):
        return False
    # worst case (_bwd_j): C/B/dB tiles (T, N), cs tiles + dcs (Hg, T),
    # xdt/dy/dx tiles + scratch (Hg, T, P); count all at 4 B.
    vmem_bytes = 4 * t * (3 * N + Hg * (4 * P + 4))
    return vmem_bytes <= 10 * 2**20


def _interpret() -> bool:
    return jax.default_backend() in ("cpu", "gpu")


def _compiler_params():
    """Raise the per-kernel scoped-VMEM ceiling to 32 MB (v5e has 128 MB
    VMEM/core; Mosaic's 16 MB default rejects the T=512 backward by 40 KB).
    None in interpret mode — the param is TPU-only metadata."""
    if _interpret():
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=32 * 2**20)


def _grids(L: int):
    t = min(_TILE, L)
    return t, L // t


def _decay_tile(csi_h, csj_h, same_tile, ii, jj):
    """exp(cs_i - cs_j) with the causal mask as a multiplicative zero (keeps
    the backward free of -inf/NaN arithmetic)."""
    seg = csi_h[:, None] - csj_h[None, :]
    return jnp.where(same_tile & (ii < jj), 0.0, jnp.exp(seg))


def _fwd_kernel(c_ref, b_ref, csi_ref, csj_ref, x_ref, y_ref, acc_ref, *, Hg, nj):
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(j <= i)
    def _compute():
        c = c_ref[0]  # (T, N)
        b = b_ref[0]  # (T, N)
        cb = lax.dot_general(
            c, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T_i, T_j)
        ii = lax.broadcasted_iota(jnp.int32, cb.shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, cb.shape, 1)
        for h in range(Hg):
            decay = _decay_tile(csi_ref[0, h], csj_ref[0, h], j == i, ii, jj)
            s = (cb * decay).astype(x_ref.dtype)
            acc_ref[h] += lax.dot_general(
                s, x_ref[0, h], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(j == nj - 1)
    def _flush():
        y_ref[0] = acc_ref[...].astype(y_ref.dtype)


def _bwd_i_kernel(
    c_ref, b_ref, csi_ref, csj_ref, x_ref, dy_ref,
    dc_ref, dcsi_ref, dc_acc, dcs_acc, *, Hg, nj,
):
    """i-indexed backward: dC_i and the +row-sum half of dcs."""
    i, j = pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dc_acc[...] = jnp.zeros_like(dc_acc)
        dcs_acc[...] = jnp.zeros_like(dcs_acc)

    @pl.when(j <= i)
    def _compute():
        c = c_ref[0]
        b = b_ref[0]
        cb = lax.dot_general(
            c, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ii = lax.broadcasted_iota(jnp.int32, cb.shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, cb.shape, 1)
        dcb = jnp.zeros_like(cb)
        for h in range(Hg):
            decay = _decay_tile(csi_ref[0, h], csj_ref[0, h], j == i, ii, jj)
            ds = lax.dot_general(  # dy_i @ x_j^T : (T_i, T_j)
                dy_ref[0, h], x_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dsd = ds * decay
            dcb += dsd
            dcs_acc[h] += jnp.sum(dsd * cb, axis=1)
        dc_acc[...] += lax.dot_general(  # dCB @ B_j : (T_i, N)
            dcb.astype(b.dtype), b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == nj - 1)
    def _flush():
        dc_ref[0] = dc_acc[...].astype(dc_ref.dtype)
        dcsi_ref[0] = dcs_acc[...].astype(dcsi_ref.dtype)


def _bwd_j_kernel(
    c_ref, b_ref, csi_ref, csj_ref, x_ref, dy_ref,
    db_ref, dx_ref, dcsj_ref, db_acc, dx_acc, dcs_acc, *, Hg, ni,
):
    """j-indexed backward: dB_j, dxdt_j and the -col-sum half of dcs."""
    j, i = pl.program_id(1), pl.program_id(2)

    @pl.when(i == j)  # i ranges over j..ni-1 effectively; i<j tiles are dead
    def _init():
        db_acc[...] = jnp.zeros_like(db_acc)
        dx_acc[...] = jnp.zeros_like(dx_acc)
        dcs_acc[...] = jnp.zeros_like(dcs_acc)

    @pl.when(j <= i)
    def _compute():
        c = c_ref[0]
        b = b_ref[0]
        cb = lax.dot_general(
            c, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T_i, T_j)
        ii = lax.broadcasted_iota(jnp.int32, cb.shape, 0)
        jj = lax.broadcasted_iota(jnp.int32, cb.shape, 1)
        dcb = jnp.zeros_like(cb)
        for h in range(Hg):
            decay = _decay_tile(csi_ref[0, h], csj_ref[0, h], j == i, ii, jj)
            s = (cb * decay).astype(dy_ref.dtype)
            dx_acc[h] += lax.dot_general(  # S^T @ dy_i : (T_j, P)
                s, dy_ref[0, h], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ds = lax.dot_general(
                dy_ref[0, h], x_ref[0, h], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dsd = ds * decay
            dcb += dsd
            dcs_acc[h] -= jnp.sum(dsd * cb, axis=0)
        db_acc[...] += lax.dot_general(  # dCB^T @ C_i : (T_j, N)
            dcb.astype(c.dtype), c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == ni - 1)
    def _flush():
        db_ref[0] = db_acc[...].astype(db_ref.dtype)
        dx_ref[0] = dx_acc[...].astype(dx_ref.dtype)
        dcsj_ref[0] = dcs_acc[...].astype(dcsj_ref.dtype)


def _cb_specs(T, N, Hg, P, order):
    """BlockSpecs shared by all three kernels.  ``order`` maps the two
    sequence grid axes: fwd/bwd_i iterate (bg, i, j); bwd_j iterates
    (bg, j, i)."""
    if order == "ij":
        gi, gj = (lambda bg, a, b: (bg, a, 0)), (lambda bg, a, b: (bg, b, 0))
        hi, hj = (lambda bg, a, b: (bg, 0, a, 0)), (lambda bg, a, b: (bg, 0, b, 0))
    else:  # grid is (bg, j, i)
        gi, gj = (lambda bg, a, b: (bg, b, 0)), (lambda bg, a, b: (bg, a, 0))
        hi, hj = (lambda bg, a, b: (bg, 0, b, 0)), (lambda bg, a, b: (bg, 0, a, 0))
    return [
        pl.BlockSpec((1, T, N), gi),  # C_i
        pl.BlockSpec((1, T, N), gj),  # B_j
        pl.BlockSpec((1, Hg, T), lambda bg, a, b, _f=gi: _h3(_f, bg, a, b)),  # cs_i
        pl.BlockSpec((1, Hg, T), lambda bg, a, b, _f=gj: _h3(_f, bg, a, b)),  # cs_j
        pl.BlockSpec((1, Hg, T, P), hj),  # xdt_j
    ], hi, hj


def _h3(f, bg, a, b):
    bgo, so, _z = f(bg, a, b)
    return (bgo, 0, so)


def _fwd(Cm, Bm, cs, xdt):
    BG, L, N = Cm.shape
    _, Hg, _, P = xdt.shape
    T, n = _grids(L)
    in_specs, hi, _hj = _cb_specs(T, N, Hg, P, "ij")
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, Hg=Hg, nj=n),
        grid=(BG, n, n),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hg, T, P), hi),
        out_shape=jax.ShapeDtypeStruct((BG, Hg, L, P), xdt.dtype),
        scratch_shapes=[pltpu.VMEM((Hg, T, P), jnp.float32)],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(Cm, Bm, cs, cs, xdt)
    return y, (Cm, Bm, cs, xdt)


def _bwd(res, dy):
    Cm, Bm, cs, xdt = res
    BG, L, N = Cm.shape
    _, Hg, _, P = xdt.shape
    T, n = _grids(L)

    in_specs, hi, _hj = _cb_specs(T, N, Hg, P, "ij")
    dC, dcs_i = pl.pallas_call(
        functools.partial(_bwd_i_kernel, Hg=Hg, nj=n),
        grid=(BG, n, n),
        in_specs=in_specs + [pl.BlockSpec((1, Hg, T, P), hi)],  # dy_i
        out_specs=[
            pl.BlockSpec((1, T, N), lambda bg, i, j: (bg, i, 0)),
            pl.BlockSpec((1, Hg, T), lambda bg, i, j: (bg, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BG, L, N), Cm.dtype),
            jax.ShapeDtypeStruct((BG, Hg, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, N), jnp.float32),
            pltpu.VMEM((Hg, T), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(Cm, Bm, cs, cs, xdt, dy)

    in_specs, hi, _hj = _cb_specs(T, N, Hg, P, "ji")
    dB, dxdt, dcs_j = pl.pallas_call(
        functools.partial(_bwd_j_kernel, Hg=Hg, ni=n),
        grid=(BG, n, n),
        in_specs=in_specs + [pl.BlockSpec((1, Hg, T, P), hi)],  # dy_i
        out_specs=[
            pl.BlockSpec((1, T, N), lambda bg, j, i: (bg, j, 0)),
            pl.BlockSpec((1, Hg, T, P), lambda bg, j, i: (bg, 0, j, 0)),
            pl.BlockSpec((1, Hg, T), lambda bg, j, i: (bg, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((BG, L, N), Bm.dtype),
            jax.ShapeDtypeStruct((BG, Hg, L, P), xdt.dtype),
            jax.ShapeDtypeStruct((BG, Hg, L), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((T, N), jnp.float32),
            pltpu.VMEM((Hg, T, P), jnp.float32),
            pltpu.VMEM((Hg, T), jnp.float32),
        ],
        interpret=_interpret(),
        compiler_params=_compiler_params(),
    )(Cm, Bm, cs, cs, xdt, dy)

    return dC, dB, (dcs_i + dcs_j).astype(cs.dtype), dxdt


@jax.custom_vjp
def decay_attention(Cm, Bm, cs, xdt):
    """y[bg,h,i] = sum_{j<=i} (C_i . B_j) exp(cs[h,i] - cs[h,j]) xdt[bg,h,j].

    Cm, Bm: (BG, L, N); cs: (BG, Hg, L) float32; xdt: (BG, Hg, L, P).
    Returns y: (BG, Hg, L, P) in xdt.dtype (accumulation in f32).
    """
    y, _ = _fwd(Cm, Bm, cs, xdt)
    return y


decay_attention.defvjp(_fwd, _bwd)
