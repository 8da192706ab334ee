"""Pallas kernels for the staged large-N path (TPU, Mosaic).

This file holds the hand-written kernels that MEASURABLY WIN on hardware —
the stage-A column-DFT+twiddle kernel of the staged large-N transform.  The
round-1 fused whole-transform kernels (direct / four-step / rfft) were
retired in round 2 after an interleaved head-to-head on a v5e showed the
XLA-scheduled jnp graph of the same math (kernels/fused_jnp.py) ahead at
every fused size, and the fused rfft kernel behind the plain real four-step
at every candidate size — see docs/ABLATION.md for the full tables and
scripts/ablate_engines.py for the reproducible harness.  The design thesis
stands in the math, not the hand-scheduling: every transform is MXU matmuls
against precomputed f64-accurate tables (kernels/tables.py), never butterfly
stages — the TPU-native answer to the reference's six CubeCL butterfly
kernels (reference ``src/butterfly.rs:32-511``).

Why stage A is a kernel and the rest is jnp:

* Stage A is a LEFT matmul (the column digit stays on the lane axis) with a
  fused twiddle — one VMEM pass over data XLA would otherwise round-trip;
  measured ~25% faster than the einsum form at n = 2^20 (104 vs 130 us).
* The fused sizes are MXU-pass-bound at HIGHEST precision and XLA already
  schedules the 3-matmul chain at ~80% of speed-of-light; a monolithic
  kernel only serializes what XLA overlaps (measured 1.15-1.5x slower).
* A fused stage-B kernel (row FFTs + the output digit reversal written as
  natural-order VMEM blocks) was also built and retired: Mosaic's lane
  tiling forces m1 = n2/128 skinny matmuls plus two in-VMEM re-rank
  transposes, measuring 64.8 us at 2^17 vs 9.4 us for the jnp form.  The
  winning realization of the same idea folds the digit reversal into the
  final einsum's output permutation (kernels/fused_jnp.py:stage_b_jnp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import config
from ..config import KARATSUBA

__all__ = ["stage_a", "whole_transform", "whole_transform_packed"]


def _dot(a, b):
    """f32 matmul on the MXU at the configured precision.

    Default (config.PRECISION="full") is HIGHEST: the 6-pass bf16
    decomposition of f32 matmuls, which is what lets the matmul formulation
    meet the reference's 5*log2(N)*eps roundtrip accuracy gate
    (``tests/roundtrip.rs:62-71``).  DEFAULT (single-pass bf16, the "fast"
    mode) measures ~3e-3 relative error — far outside the gate.  Mosaic has
    no 3-pass lowering, so the "high" mode maps to HIGHEST here.
    """
    return jnp.dot(
        a, b, precision=config.mosaic_precision(), preferred_element_type=jnp.float32
    )


def _cmul(ar, ai, br, bi):
    """Split-complex elementwise multiply."""
    return ar * br - ai * bi, ar * bi + ai * br


def _cmatmul(ar, ai, f):
    """Split-complex matmul against a table group f = (fr, fi, fsum, fdif).

    KARATSUBA=True: Gauss 3-multiplication form
        k1 = (ar + ai) @ fr;  k2 = ar @ (fi - fr);  k3 = ai @ (fr + fi)
        re = k1 - k3;         im = k1 + k2
    (3 full-precision MXU passes); otherwise the plain 4-multiplication form.
    """
    fr, fi, fs, fd = f
    if KARATSUBA:
        k1 = _dot(ar + ai, fr)
        k2 = _dot(ar, fd)
        k3 = _dot(ai, fs)
        return k1 - k3, k1 + k2
    return _dot(ar, fr) - _dot(ai, fi), _dot(ar, fi) + _dot(ai, fr)


# ── Stage A: column DFT + twiddle (the large-N workhorse) ────────────────────


def _tw_block(two_r, two_i, twi_r, twi_i):
    """Reconstruct the (n1, ct) twiddle block from its outer/inner factors.

    The full (n1, n2) twiddle W_n^(k1*c) factors exactly over c = j*ct + cc:
    ``outer[k1, j] = W_n^(k1*j*ct)`` (one column per grid step j) times
    ``inner[k1, cc] = W_n^(k1*cc)`` (constant across steps).  Both factor
    tables are tiny VMEM residents (DMA'd once), so reconstructing in-kernel
    replaces the materialized table's n-sized HBM read (8 MB at 2^20) with
    ~n1*ct VPU flops — stage A drops from HBM-bound toward compute-bound.

    The grid-step column is selected by mask+reduce over the (n1, n2/ct)
    outer table: Mosaic cannot DMA a lane-width-1 block, and an arbitrary
    in-kernel lane gather would hit the scalar core; ``iota == j`` times a
    lane-axis sum is pure vector work over a <=256-lane table.
    """
    j = pl.program_id(1)
    lane = lax.broadcasted_iota(jnp.int32, two_r.shape, 1)
    m = (lane == j).astype(jnp.float32)
    o_r = jnp.sum(two_r * m, axis=1, keepdims=True)  # (n1, 1)
    o_i = jnp.sum(two_i * m, axis=1, keepdims=True)
    return o_r * twi_r - o_i * twi_i, o_r * twi_i + o_i * twi_r


def _stage_a_real_kernel(
    x_ref, f1r, f1i, two_r, two_i, twi_r, twi_i, yr_ref, yi_ref
):
    """Column DFT + twiddle for the staged large-N path (real input).

    Block: x (1, n1, ct) — ct columns of the (n1, n2) matrix view.  Computes
    Y[k1, c] = sum_a F1[k1, a] * x[a, c], then multiplies by the large-N
    twiddle W_n^(k1 * col) — a LEFT matmul, so no transpose is needed
    anywhere in this stage (the column digit stays on the lane axis).
    """
    xb = x_ref[0]
    pr = _dot(f1r[...], xb)
    pi = _dot(f1i[...], xb)
    twr, twi = _tw_block(two_r[...], two_i[...], twi_r[...], twi_i[...])
    yr, yi = _cmul(pr, pi, twr, twi)
    yr_ref[0] = yr
    yi_ref[0] = yi


def _stage_a_complex_kernel(
    xr_ref, xi_ref, f1r, f1i, f1s, f1d, two_r, two_i, twi_r, twi_i, yr_ref, yi_ref
):
    xbr = xr_ref[0]
    xbi = xi_ref[0]
    fr, fi, fs, fd = f1r[...], f1i[...], f1s[...], f1d[...]
    if KARATSUBA:
        k1 = _dot(fr, xbr + xbi)
        k2 = _dot(fd, xbr)
        k3 = _dot(fs, xbi)
        pr, pi = k1 - k3, k1 + k2
    else:
        pr = _dot(fr, xbr) - _dot(fi, xbi)
        pi = _dot(fr, xbi) + _dot(fi, xbr)
    twr, twi = _tw_block(two_r[...], two_i[...], twi_r[...], twi_i[...])
    yr, yi = _cmul(pr, pi, twr, twi)
    yr_ref[0] = yr
    yi_ref[0] = yi


# Legacy full-table variants (archived ablation harnesses build plan dicts
# with a materialized (n1, n2) twiddle; production plans carry the factored
# tables and take the kernels above).


def _stage_a_real_kernel_full(x_ref, f1r, f1i, twr_ref, twi_ref, yr_ref, yi_ref):
    xb = x_ref[0]
    pr = _dot(f1r[...], xb)
    pi = _dot(f1i[...], xb)
    yr, yi = _cmul(pr, pi, twr_ref[...], twi_ref[...])
    yr_ref[0] = yr
    yi_ref[0] = yi


def _stage_a_complex_kernel_full(
    xr_ref, xi_ref, f1r, f1i, f1s, f1d, twr_ref, twi_ref, yr_ref, yi_ref
):
    xbr = xr_ref[0]
    xbi = xi_ref[0]
    fr, fi = f1r[...], f1i[...]
    if KARATSUBA:
        k1 = _dot(fr, xbr + xbi)
        k2 = _dot(f1d[...], xbr)
        k3 = _dot(f1s[...], xbi)
        pr, pi = k1 - k3, k1 + k2
    else:
        pr = _dot(fr, xbr) - _dot(fi, xbi)
        pi = _dot(fr, xbi) + _dot(fi, xbr)
    yr, yi = _cmul(pr, pi, twr_ref[...], twi_ref[...])
    yr_ref[0] = yr
    yi_ref[0] = yi


# Tables whose leading axis is k1 — sliceable when only `rows` output rows
# are needed (the f1 group and every twiddle form).
_ROW_TABLES = frozenset(
    {"f1r", "f1i", "f1s", "f1d", "two_r", "two_i", "twi_r", "twi_i", "twr", "twi"}
)


def stage_a(
    xr,
    xi,
    n1: int,
    n2: int,
    tables,
    col_tile: int,
    col_tiles: int | None = None,
    rows: int | None = None,
):
    """Run the column-DFT+twiddle stage over a (B, n1, n2) view.

    ``tables``: f1 group (n1 x n1, ext) + twiddle — either factored
    (``two_r/two_i`` (n1, n2/ct) + ``twi_r/twi_i`` (n1, ct), the production
    layout from ``plan.get_stage_a_plan``) or a materialized (n1, n2)
    ``twr/twi`` pair (legacy).  Returns split-complex (B, n1, n2).

    ``col_tiles`` limits the grid to the FIRST ``col_tiles`` column tiles,
    returning (B, n1, col_tiles * col_tile) — the real-output inverse only
    needs columns c <= n2/2 (the rest are conjugate mirrors,
    plan.get_stage_b_irfft_plan), so it skips ~half the stage-A programs.

    ``rows`` limits the OUTPUT to the first ``rows`` k1 rows (the f1 and
    twiddle tables are sliced at trace time), returning (B, rows, n2) —
    a real input's stage-A output is conjugate-symmetric over k1
    (S[n1-k1, c] = conj(S[k1, c])), and the half-spectrum stage B reads
    only k1 <= n1/2, so the forward staged real path computes just
    ceil-to-sublane(n1/2 + 1) rows instead of n1: ~0.56x the dominant
    stage-A matmul (docs/ABLATION.md §13 addendum).
    """
    b = xr.shape[0]
    factored = "two_r" in tables
    if factored and col_tile != tables["ct"]:
        raise ValueError(
            f"col_tile {col_tile} does not match the plan's factored tile {tables['ct']}"
        )
    n_tiles = n2 // col_tile if col_tiles is None else col_tiles
    if not 1 <= n_tiles <= n2 // col_tile:
        raise ValueError(f"col_tiles {col_tiles} out of range for n2={n2}, ct={col_tile}")
    n2 = n_tiles * col_tile  # output width: the kept column range
    grid = (b, n_tiles)
    out_rows = n1
    if rows is not None:
        if not 8 <= rows <= n1 or rows % 8:
            raise ValueError(f"rows {rows} must be a sublane multiple in [8, n1={n1}]")
        tables = {
            k: (v[:rows] if k in _ROW_TABLES and hasattr(v, "shape") else v)
            for k, v in tables.items()
        }
        out_rows = rows
    x_spec = _vmem_spec((1, n1, col_tile), lambda i, j: (i, 0, j))
    f_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    if factored:
        # Outer factor loads whole (it is <=(n1, 256) — one DMA, resident);
        # the kernel masks out grid step j's column.
        tw_specs = [
            f_spec(tables["two_r"].shape),
            f_spec(tables["two_i"].shape),
            f_spec((out_rows, col_tile)),
            f_spec((out_rows, col_tile)),
        ]
        tw_args = (tables["two_r"], tables["two_i"], tables["twi_r"], tables["twi_i"])
    else:
        tw_spec = pl.BlockSpec((out_rows, col_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        tw_specs = [tw_spec, tw_spec]
        tw_args = (tables["twr"], tables["twi"])
    out_shape = [jax.ShapeDtypeStruct((b, out_rows, n2), jnp.float32)] * 2
    o_spec = _vmem_spec((1, out_rows, col_tile), lambda i, j: (i, 0, j))
    out_specs = [o_spec, o_spec]
    if xi is None:
        kern = _stage_a_real_kernel if factored else _stage_a_real_kernel_full
        names = ("f1r", "f1i")
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[x_spec] + [f_spec(tables[k].shape) for k in names] + tw_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_interpret(),
        )(xr, *(tables[k] for k in names), *tw_args)
    kern = _stage_a_complex_kernel if factored else _stage_a_complex_kernel_full
    names = ("f1r", "f1i", "f1s", "f1d")
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[x_spec, x_spec]
        + [f_spec(tables[k].shape) for k in names]
        + tw_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(xr, xi, *(tables[k] for k in names), *tw_args)


# ── Whole-transform single-kernel path (the latency-bound small-N band) ─────
#
# The reference's central design idea is the single-dispatch fused kernel for
# N <= TILE (``butterfly_inner``, reference src/butterfly.rs:84-147; launch
# table README.md:397-405).  Round 2 retired the round-1 fused kernels on
# THROUGHPUT grounds — but at B ~ 1, n = 1024..16384 the XLA schedule's ~11
# fusions are the bound, not the math (fft_n1024: 2.44 us measured vs a
# 1.21 us launch floor, BENCH_DETAILS r4).  This kernel is the
# launch-count-minimizing translation: the ENTIRE four-step — column DFT,
# twiddle, lane-axis row DFT with the digit reversal falling out of the
# output block layout — in ONE pallas_call.  Dispatch is gated per (B, n) by
# the measured table (tuning.whole_*; scripts/ablate_whole_kernel.py).


def _dot_nt(a, z):
    """out[i, k] = sum_c a[i, c] * z[k, c] — contraction on BOTH minor axes.

    The MXU streams the rhs transposed natively (dot_general with rhs
    contracting dim 1), so the (n1, n2) -> (n2, n1) axis swap of the
    four-step's middle costs no separate relayout pass.
    """
    return lax.dot_general(
        a,
        z,
        (((1,), (1,)), ((), ())),
        precision=config.mosaic_precision(),
        preferred_element_type=jnp.float32,
    )


def _whole_stage2(zr, zi, f2r, f2s, f2d, yr_ref, yi_ref):
    """Shared stage 2: contract the lane digit c, natural-order (n2, n1) out."""
    if KARATSUBA:
        k1 = _dot_nt(f2r, zr + zi)
        k2 = _dot_nt(f2d, zr)
        k3 = _dot_nt(f2s, zi)
        yr_ref[0] = k1 - k3
        yi_ref[0] = k1 + k2
    else:
        fi = f2s - f2r  # ext group: fs = fr + fi
        yr_ref[0] = _dot_nt(f2r, zr) - _dot_nt(fi, zi)
        yi_ref[0] = _dot_nt(f2r, zi) + _dot_nt(fi, zr)


def _whole_real_kernel(x_ref, f1r, f1i, twr, twi, f2r, f2s, f2d, yr_ref, yi_ref):
    xb = x_ref[0]  # (n1, n2) = [a, c]
    pr = _dot(f1r[...], xb)
    pi = _dot(f1i[...], xb)
    zr, zi = _cmul(pr, pi, twr[...], twi[...])
    _whole_stage2(zr, zi, f2r[...], f2s[...], f2d[...], yr_ref, yi_ref)


def _whole_complex_kernel(
    xr_ref, xi_ref, f1r, f1s, f1d, twr, twi, f2r, f2s, f2d, yr_ref, yi_ref
):
    xbr = xr_ref[0]
    xbi = xi_ref[0]
    if KARATSUBA:
        k1 = _dot(f1r[...], xbr + xbi)
        k2 = _dot(f1d[...], xbr)
        k3 = _dot(f1s[...], xbi)
        pr, pi = k1 - k3, k1 + k2
    else:
        fi = f1s[...] - f1r[...]
        pr = _dot(f1r[...], xbr) - _dot(fi, xbi)
        pi = _dot(f1r[...], xbi) + _dot(fi, xbr)
    zr, zi = _cmul(pr, pi, twr[...], twi[...])
    _whole_stage2(zr, zi, f2r[...], f2s[...], f2d[...], yr_ref, yi_ref)


def _whole_packed_real_kernel(x_ref, t_ref, yr_ref, yi_ref, *, n1):
    xb = x_ref[0]  # (n1, 128) = [a, c]
    f1 = t_ref[0 : 2 * n1, 0:n1]  # [F1r; F1i]
    p = _dot(f1, xb)  # (2n1, 128) = [Pr; Pi]
    pr, pi = p[:n1], p[n1:]
    twr = t_ref[2 * n1 : 3 * n1, :]
    twi = t_ref[3 * n1 : 4 * n1, :]
    zr, zi = _cmul(pr, pi, twr, twi)
    f2 = t_ref[4 * n1 : 4 * n1 + 256, :]  # [F2r; F2i]
    a = _dot_nt(f2, zr)  # (256, n1) = [F2r x Zr; F2i x Zr]
    c = _dot_nt(f2, zi)
    yr_ref[0] = a[:128] - c[128:]
    yi_ref[0] = c[:128] + a[128:]


def _whole_packed_complex_kernel(xr_ref, xi_ref, t_ref, yr_ref, yi_ref, *, n1):
    f1 = t_ref[0 : 2 * n1, 0:n1]
    p = _dot(f1, xr_ref[0])  # [F1r xr; F1i xr]
    q = _dot(f1, xi_ref[0])  # [F1r xi; F1i xi]
    pr = p[:n1] - q[n1:]
    pi = p[n1:] + q[:n1]
    twr = t_ref[2 * n1 : 3 * n1, :]
    twi = t_ref[3 * n1 : 4 * n1, :]
    zr, zi = _cmul(pr, pi, twr, twi)
    f2 = t_ref[4 * n1 : 4 * n1 + 256, :]
    a = _dot_nt(f2, zr)
    c = _dot_nt(f2, zi)
    yr_ref[0] = a[:128] - c[128:]
    yi_ref[0] = c[:128] + a[128:]


def whole_transform_packed(xr, xi, plan: dict):
    """The whole-transform single kernel with ONE packed table operand.

    Same dataflow as :func:`whole_transform` but the measured serial
    bottlenecks are collapsed: one table DMA issue instead of 7-8, and 3
    stacked dots (real; 4 complex) instead of 5-6 (docs/ABLATION.md §24;
    ``plan``: :func:`plan.get_whole_packed_plan`).  Returns split-complex
    (B, n) in natural order.
    """
    import functools as _ft

    b, n = xr.shape
    n1, n2 = plan["n1"], plan["n2"]
    assert n == n1 * n2, (n, n1, n2)
    packed = plan["packed"]
    grid = (b,)
    x_spec = _vmem_spec((1, n1, n2), lambda i: (i, 0, 0))
    t_spec = pl.BlockSpec(packed.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    o_spec = _vmem_spec((1, n2, n1), lambda i: (i, 0, 0))
    out_shape = [jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2
    if xi is None:
        yr, yi = pl.pallas_call(
            _ft.partial(_whole_packed_real_kernel, n1=n1),
            grid=grid,
            in_specs=[x_spec, t_spec],
            out_specs=[o_spec, o_spec],
            out_shape=out_shape,
            interpret=_interpret(),
        )(xr.reshape(b, n1, n2), packed)
    else:
        yr, yi = pl.pallas_call(
            _ft.partial(_whole_packed_complex_kernel, n1=n1),
            grid=grid,
            in_specs=[x_spec, x_spec, t_spec],
            out_specs=[o_spec, o_spec],
            out_shape=out_shape,
            interpret=_interpret(),
        )(xr.reshape(b, n1, n2), xi.reshape(b, n1, n2), packed)
    return yr.reshape(b, n), yi.reshape(b, n)


def whole_transform(xr, xi, plan: dict):
    """ONE pallas_call for the entire (B, n) fused transform.

    ``plan``: ``plan.get_whole_plan(n, sign, scale)`` — f1/tw/f2 tables
    oriented so the kernel's output block (n2, n1) flattens to the
    natural-order spectrum (flat k = k1 + n1*j).  ``xi`` may be None (real
    input: 5 in-kernel MXU dots; complex: 6).  Returns split-complex (B, n).
    """
    b, n = xr.shape
    n1, n2 = plan["n1"], plan["n2"]
    assert n == n1 * n2, (n, n1, n2)
    grid = (b,)
    x_spec = _vmem_spec((1, n1, n2), lambda i: (i, 0, 0))
    t_spec = lambda key: pl.BlockSpec(
        plan[key].shape, lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    o_spec = _vmem_spec((1, n2, n1), lambda i: (i, 0, 0))
    out_shape = [jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2
    if xi is None:
        names = ("f1r", "f1i", "twr", "twi", "f2r", "f2s", "f2d")
        yr, yi = pl.pallas_call(
            _whole_real_kernel,
            grid=grid,
            in_specs=[x_spec] + [t_spec(k) for k in names],
            out_specs=[o_spec, o_spec],
            out_shape=out_shape,
            interpret=_interpret(),
        )(xr.reshape(b, n1, n2), *(plan[k] for k in names))
    else:
        names = ("f1r", "f1s", "f1d", "twr", "twi", "f2r", "f2s", "f2d")
        yr, yi = pl.pallas_call(
            _whole_complex_kernel,
            grid=grid,
            in_specs=[x_spec, x_spec] + [t_spec(k) for k in names],
            out_specs=[o_spec, o_spec],
            out_shape=out_shape,
            interpret=_interpret(),
        )(xr.reshape(b, n1, n2), xi.reshape(b, n1, n2), *(plan[k] for k in names))
    return yr.reshape(b, n), yi.reshape(b, n)


# ── Shared spec helpers ──────────────────────────────────────────────────────


def _interpret() -> bool:
    # On non-TPU platforms (the CPU test mesh) kernels run in interpreter
    # mode; on TPU they compile through Mosaic.
    return jax.default_backend() != "tpu"


def _const_spec(shape):
    # Table blocks: same block for every grid step; Pallas skips the re-DMA
    # when the block index does not change.
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _vmem_spec(shape, index_map):
    return pl.BlockSpec(shape, index_map, memory_space=pltpu.VMEM)
