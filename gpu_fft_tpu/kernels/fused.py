"""Fused single-dispatch FFT kernels (Pallas, TPU).

This file is the TPU-native replacement for the reference's six CubeCL
butterfly kernels (reference ``src/butterfly.rs:32-511``).  The design is a
deliberate departure, per the repo north star:

* The reference runs log2(N) radix-2/4 *butterfly stages* over global memory,
  fusing only the first 10 stages into shared memory (``butterfly_inner``,
  ``src/butterfly.rs:84-147``) because GPU workgroups cap the tile at 1024
  elements.  A TPU core has ~16 MiB of VMEM, so we fuse the ENTIRE transform
  (N <= 65536) into one kernel — the logical conclusion of the reference's own
  "fewer dispatches" strategy (``README.md:397-405``).

* Butterfly stages are strided scalar ops — hostile to the TPU's (8, 128)
  vector layout and idle MXU.  Instead the transform is cast as MATRIX
  MULTIPLICATION, where TPU FLOPs actually live:

    - ``direct``:   X = x @ F_n                      (one complex matmul)
    - ``fourstep``: n = n1*n2 Cooley-Tukey factorization
    - ``rfft``:     real-input forward via the fused half-length transform

  Four-step derivation (flat index n = a*n2 + b, output k = k1 + n1*k2):

      X[k1 + n1*k2] = sum_b W_n2^(b*k2) * W_n^(b*k1) * sum_a x[a,b] W_n1^(a*k1)

  realized as:  transpose -> (rows @ F1) -> twiddle -> transpose -> (rows @ F2)
  -> transpose, with the batch dimension folded into the matmul rows so one
  kernel serves both a single long signal and a large batch of short ones.
  All three transposes are minor-two-dim VMEM transposes.  The final
  transpose also performs the Cooley-Tukey output digit reversal, replacing
  the reference's CPU-side bit-reverse permutation pass (``src/fft.rs:54-59``,
  ``src/butterfly.rs:521-528``) — there is no bit-reversal anywhere.

* Twiddles/DFT matrices are precomputed in f64 and live in VMEM for the whole
  kernel (see kernels/tables.py), instead of per-thread cos/sin
  (``src/butterfly.rs:45-48``).

* Complex matmuls use the Gauss/Karatsuba 3-multiplication form by default
  (``config.KARATSUBA``), with the sum/difference matrices precomputed in
  f64 — 25% fewer full-precision MXU passes than the 4-multiplication form.

Batching: the grid iterates over row-tiles of the (B, n) batch, the analog of
the reference's flat batched dispatches (``butterfly_inner_batch``,
``src/butterfly.rs:238-298``) — launch count stays independent of B, which is
the reference's central batching win (``README.md:451-455``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import KARATSUBA
from ..plan import FusedPlan, batch_tile

__all__ = ["fused_fft", "fused_rfft"]


def _dot(a, b):
    """f32 matmul on the MXU at full (HIGHEST) precision.

    HIGHEST forces the 6-pass bf16 decomposition of f32 matmuls, which is what
    lets the matmul formulation meet the reference's 5*log2(N)*eps roundtrip
    accuracy gate (``tests/roundtrip.rs:62-71``).  DEFAULT (single-pass bf16)
    measures ~3e-3 relative error — far outside the gate.
    """
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)


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


# ── Kernel bodies ────────────────────────────────────────────────────────────


def _direct_real_kernel(x_ref, fr_ref, fi_ref, yr_ref, yi_ref):
    x = x_ref[...]
    yr_ref[...] = _dot(x, fr_ref[...])
    yi_ref[...] = _dot(x, fi_ref[...])


def _direct_complex_kernel(xr_ref, xi_ref, fr_ref, fi_ref, fs_ref, fd_ref, yr_ref, yi_ref):
    yr, yi = _cmatmul(
        xr_ref[...], xi_ref[...], (fr_ref[...], fi_ref[...], fs_ref[...], fd_ref[...])
    )
    yr_ref[...] = yr
    yi_ref[...] = yi


def _fourstep_core(pr, pi, bt, n1, n2, twr, twi, f2, yr_ref, yi_ref):
    """Steps shared by the real/complex four-step kernels.

    ``pr, pi``: column-DFT output, shape (bt*n2, n1), row index (batch, b),
    column index k1.  Applies twiddle, row DFT, and the output digit-reversal
    transpose, writing (bt, n2, n1) blocks whose row-major flattening is the
    naturally ordered spectrum.
    """
    p3r = pr.reshape(bt, n2, n1)
    p3i = pi.reshape(bt, n2, n1)
    zr, zi = _cmul(p3r, p3i, twr[None], twi[None])  # twiddle W_n^(b*k1), (n2, n1)
    qr = jnp.swapaxes(zr, 1, 2).reshape(bt * n1, n2)
    qi = jnp.swapaxes(zi, 1, 2).reshape(bt * n1, n2)
    rr, ri = _cmatmul(qr, qi, f2)  # rows (batch, k1), cols k2
    yr_ref[...] = jnp.swapaxes(rr.reshape(bt, n1, n2), 1, 2)
    yi_ref[...] = jnp.swapaxes(ri.reshape(bt, n1, n2), 1, 2)


def _fourstep_real_kernel(
    x_ref, f1r, f1i, twr, twi, f2r, f2i, f2s, f2d, yr_ref, yi_ref
):
    bt, n1, n2 = x_ref.shape
    xt = jnp.swapaxes(x_ref[...], 1, 2).reshape(bt * n2, n1)
    # Column DFT of a REAL signal: 2 matmuls instead of 3/4 — the forward
    # public API always takes real input, so the fast path is structural.
    pr = _dot(xt, f1r[...])
    pi = _dot(xt, f1i[...])
    _fourstep_core(
        pr, pi, bt, n1, n2, twr[...], twi[...],
        (f2r[...], f2i[...], f2s[...], f2d[...]), yr_ref, yi_ref,
    )


def _fourstep_complex_kernel(
    xr_ref, xi_ref, f1r, f1i, f1s, f1d, twr, twi, f2r, f2i, f2s, f2d, yr_ref, yi_ref
):
    bt, n1, n2 = xr_ref.shape
    xtr = jnp.swapaxes(xr_ref[...], 1, 2).reshape(bt * n2, n1)
    xti = jnp.swapaxes(xi_ref[...], 1, 2).reshape(bt * n2, n1)
    pr, pi = _cmatmul(xtr, xti, (f1r[...], f1i[...], f1s[...], f1d[...]))
    _fourstep_core(
        pr, pi, bt, n1, n2, twr[...], twi[...],
        (f2r[...], f2i[...], f2s[...], f2d[...]), yr_ref, yi_ref,
    )


def _rfft_kernel_factory(n, h1, h2):
    """Fully-fused real-input forward FFT kernel for length n = 2 * h1 * h2.

    Pipeline, entirely in VMEM: even/odd selection matmul -> half-length
    complex four-step -> conjugate-symmetric untangle (index reversal via
    exact permutation matmuls, see plan.get_rfft_plan) -> full n-bin
    spectrum.  Roughly halves the full-precision MXU work of the forward
    path versus transforming the zero-padded complex signal.
    """
    t = 2 * h2  # PACK_TILE; h1 = n // t by construction (see get_rfft_plan)
    assert h1 == n // t

    def kernel(
        x_ref, sel, f1r, f1i, f1s, f1d, twr, twi, f2r, f2i, f2s, f2d,
        pc, q1, q0, ur, ui, yr_ref, yi_ref,
    ):
        bt = x_ref.shape[0]  # input block is (bt, h1, t), pre-shaped by caller
        # Step 0: even/odd deinterleave on the MXU.  The (n/t, t/2)-tiled
        # halves are exactly the (h1, h2) four-step view — no reshape.
        packed = _dot(x_ref[...].reshape(bt * h1, t), sel[...])
        p3 = packed.reshape(bt, h1, t)
        zr = p3[:, :, : t // 2]
        zi = p3[:, :, t // 2 :]
        # Half-length complex four-step.
        xtr = jnp.swapaxes(zr, 1, 2).reshape(bt * h2, h1)
        xti = jnp.swapaxes(zi, 1, 2).reshape(bt * h2, h1)
        pr, pi = _cmatmul(xtr, xti, (f1r[...], f1i[...], f1s[...], f1d[...]))
        p3r = pr.reshape(bt, h2, h1)
        p3i = pi.reshape(bt, h2, h1)
        wr, wi = _cmul(p3r, p3i, twr[...][None], twi[...][None])
        qr_ = jnp.swapaxes(wr, 1, 2).reshape(bt * h1, h2)
        qi_ = jnp.swapaxes(wi, 1, 2).reshape(bt * h1, h2)
        rr, ri = _cmatmul(qr_, qi_, (f2r[...], f2i[...], f2s[...], f2d[...]))
        # Natural-order half spectrum A[k2, k1] = Z[k1 + h1*k2].
        ar = jnp.swapaxes(rr.reshape(bt, h1, h2), 1, 2)
        ai = jnp.swapaxes(ri.reshape(bt, h1, h2), 1, 2)
        # Index reversal Z[(h-k) % h] via permutation matmuls (exact 0/1).
        b1r = _dot(ar.reshape(bt * h2, h1), pc[...]).reshape(bt, h2, h1)
        b1i = _dot(ai.reshape(bt * h2, h1), pc[...]).reshape(bt, h2, h1)
        b1r_sw = jnp.swapaxes(b1r, 1, 2).reshape(bt * h1, h2)
        b1i_sw = jnp.swapaxes(b1i, 1, 2).reshape(bt * h1, h2)

        def row_perm(q):
            dr = jnp.swapaxes(_dot(b1r_sw, q[...]).reshape(bt, h1, h2), 1, 2)
            di = jnp.swapaxes(_dot(b1i_sw, q[...]).reshape(bt, h1, h2), 1, 2)
            return dr, di

        d1r, d1i = row_perm(q1)
        d0r, d0i = row_perm(q0)
        col0 = jax.lax.broadcasted_iota(jnp.int32, (bt, h2, h1), 2) == 0
        revr = jnp.where(col0, d0r, d1r)
        revi = jnp.where(col0, d0i, d1i)
        # Untangle: E + u*O (first half), E - u*O (second half).
        er = 0.5 * (ar + revr)
        ei = 0.5 * (ai - revi)
        o_r = 0.5 * (ai + revi)
        o_i = -0.5 * (ar - revr)
        tr, ti = _cmul(o_r, o_i, ur[...][None], ui[...][None])
        yr_ref[...] = jnp.stack([er + tr, er - tr], axis=1)
        yi_ref[...] = jnp.stack([ei + ti, ei - ti], axis=1)

    return kernel


def _stage_a_real_kernel(x_ref, f1r, f1i, twr_ref, twi_ref, yr_ref, yi_ref):
    """Column DFT + twiddle for the staged large-N path (real input).

    Block: x (1, n1, ct) — ct columns of the (n1, n2) matrix view.  Computes
    Y[k1, c] = sum_a F1[k1, a] * x[a, c], then multiplies by the large-N
    twiddle W_n^(k1 * col) — a LEFT matmul, so no transpose is needed
    anywhere in this stage (the column digit stays on the lane axis).
    """
    xb = x_ref[0]
    pr = _dot(f1r[...], xb)
    pi = _dot(f1i[...], xb)
    yr, yi = _cmul(pr, pi, twr_ref[...], twi_ref[...])
    yr_ref[0] = yr
    yi_ref[0] = yi


def _stage_a_complex_kernel(
    xr_ref, xi_ref, f1r, f1i, f1s, f1d, twr_ref, twi_ref, yr_ref, yi_ref
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
    yr, yi = _cmul(pr, pi, twr_ref[...], twi_ref[...])
    yr_ref[0] = yr
    yi_ref[0] = yi


def stage_a(xr, xi, n1: int, n2: int, tables, col_tile: int):
    """Run the column-DFT+twiddle stage over a (B, n1, n2) view.

    ``tables``: f1 group (n1 x n1, ext) + twiddle (n1, n2).  Returns
    split-complex (B, n1, n2).
    """
    b = xr.shape[0]
    grid = (b, n2 // col_tile)
    x_spec = _vmem_spec((1, n1, col_tile), lambda i, j: (i, 0, j))
    f_spec = lambda shape: pl.BlockSpec(shape, lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((n1, col_tile), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2
    out_specs = [x_spec, x_spec]
    if xi is None:
        names = ("f1r", "f1i")
        return pl.pallas_call(
            _stage_a_real_kernel,
            grid=grid,
            in_specs=[x_spec] + [f_spec(tables[k].shape) for k in names] + [tw_spec] * 2,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_interpret(),
        )(xr, *(tables[k] for k in names), tables["twr"], tables["twi"])
    names = ("f1r", "f1i", "f1s", "f1d")
    return pl.pallas_call(
        _stage_a_complex_kernel,
        grid=grid,
        in_specs=[x_spec, x_spec]
        + [f_spec(tables[k].shape) for k in names]
        + [tw_spec] * 2,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(xr, xi, *(tables[k] for k in names), tables["twr"], tables["twi"])


# ── Host-side dispatch ───────────────────────────────────────────────────────


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


def fused_fft(xr, xi, plan: FusedPlan):
    """Run one fused transform over a (B, n) batch.

    ``xi`` may be None (real input — forward transforms from the public API).
    Returns split-complex (yr, yi), each (B, n), in natural spectral order.
    No normalization is applied (the inverse 1/N scale is the caller's job,
    mirroring reference ``src/ifft.rs:140-146``).
    """
    b, n = xr.shape
    assert n == plan.n, (n, plan.n)
    if b == 0:
        # A zero-row batch would build an unsupported grid=(0,) pallas_call;
        # the host API guards B=0 but the device path must too.
        return xr, xr if xi is None else xi
    t = plan.tables
    bt = batch_tile(n, complex_input=xi is not None)
    bpad = -b % bt
    if bpad:
        xr = jnp.pad(xr, ((0, bpad), (0, 0)))
        if xi is not None:
            xi = jnp.pad(xi, ((0, bpad), (0, 0)))
    bp = b + bpad
    grid = (bp // bt,)

    if plan.kind == "direct":
        data_spec = _vmem_spec((bt, n), lambda i: (i, 0))
        out_shape = [
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
            jax.ShapeDtypeStruct((bp, n), jnp.float32),
        ]
        if xi is None:
            names = ("fr", "fi")
            yr, yi = pl.pallas_call(
                _direct_real_kernel,
                grid=grid,
                in_specs=[data_spec] + [_const_spec(t[k].shape) for k in names],
                out_specs=[data_spec] * 2,
                out_shape=out_shape,
                interpret=_interpret(),
            )(xr, *(t[k] for k in names))
        else:
            names = ("fr", "fi", "fs", "fd")
            yr, yi = pl.pallas_call(
                _direct_complex_kernel,
                grid=grid,
                in_specs=[data_spec] * 2 + [_const_spec(t[k].shape) for k in names],
                out_specs=[data_spec] * 2,
                out_shape=out_shape,
                interpret=_interpret(),
            )(xr, xi, *(t[k] for k in names))
        return yr[:b], yi[:b]

    n1, n2 = plan.n1, plan.n2
    in_spec = _vmem_spec((bt, n1, n2), lambda i: (i, 0, 0))
    out_spec = _vmem_spec((bt, n2, n1), lambda i: (i, 0, 0))
    out_shape = [
        jax.ShapeDtypeStruct((bp, n2, n1), jnp.float32),
        jax.ShapeDtypeStruct((bp, n2, n1), jnp.float32),
    ]
    x3r = xr.reshape(bp, n1, n2)
    if xi is None:
        names = ("f1r", "f1i", "twr", "twi", "f2r", "f2i", "f2s", "f2d")
        yr, yi = pl.pallas_call(
            _fourstep_real_kernel,
            grid=grid,
            in_specs=[in_spec] + [_const_spec(t[k].shape) for k in names],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=_interpret(),
        )(x3r, *(t[k] for k in names))
    else:
        x3i = xi.reshape(bp, n1, n2)
        names = (
            "f1r", "f1i", "f1s", "f1d", "twr", "twi", "f2r", "f2i", "f2s", "f2d"
        )
        yr, yi = pl.pallas_call(
            _fourstep_complex_kernel,
            grid=grid,
            in_specs=[in_spec, in_spec] + [_const_spec(t[k].shape) for k in names],
            out_specs=[out_spec, out_spec],
            out_shape=out_shape,
            interpret=_interpret(),
        )(x3r, x3i, *(t[k] for k in names))
    # (bp, n2, n1) row-major flattening is already the natural order k1 + n1*k2.
    return yr.reshape(bp, n)[:b], yi.reshape(bp, n)[:b]


def fused_rfft(x, plan):
    """Real-input forward transform via the fused rfft kernel.

    ``x``: (B, n) real f32.  Returns split-complex (B, n) natural order.
    """
    b, n = x.shape
    assert n == 2 * plan.n1 * plan.n2, (n, plan.n1, plan.n2)
    if b == 0:
        return x, x
    h1, h2 = plan.n1, plan.n2
    t = plan.tables
    bt = batch_tile(n, complex_input=True)
    bpad = -b % bt
    if bpad:
        x = jnp.pad(x, ((0, bpad), (0, 0)))
    bp = b + bpad
    grid = (bp // bt,)
    pack_t = 2 * h2
    # 3-D input blocks keep the last two dims tile-aligned even at bt=1.
    in_spec = _vmem_spec((bt, h1, pack_t), lambda i: (i, 0, 0))
    out_spec = _vmem_spec((bt, 2, h2, h1), lambda i: (i, 0, 0, 0))
    names = (
        "sel", "f1r", "f1i", "f1s", "f1d", "twr", "twi",
        "f2r", "f2i", "f2s", "f2d", "pc", "q1", "q0", "ur", "ui",
    )
    table_specs = [_const_spec(t[k].shape) for k in names]
    out_shape = [jax.ShapeDtypeStruct((bp, 2, h2, h1), jnp.float32)] * 2
    yr, yi = pl.pallas_call(
        _rfft_kernel_factory(n, h1, h2),
        grid=grid,
        in_specs=[in_spec] + table_specs,
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        interpret=_interpret(),
    )(x.reshape(bp, h1, pack_t), *(t[k] for k in names))
    # (bt, 2, h2, h1) flattens to [half*h + k2*h1 + k1] = the natural k order.
    return yr.reshape(bp, n)[:b], yi.reshape(bp, n)[:b]
