"""Large-N transforms: staged four-step factorization at the JAX level.

The reference handles growing N with more outer radix-4 dispatches
(``src/fft.rs:93-127``) and tops out its benchmarks at N = 65,536.  Here,
transforms beyond FUSED_MAX run STAGED: a Pallas column-DFT-plus-twiddle
kernel over the (n1, n2) matrix view (a LEFT matmul — no transposes, the
column digit never leaves the lane axis), then the row transforms of length
n2, then the output digit reversal.  This extends coverage to the 2^20+
range called for by BASELINE.json's north star.

Engine selection is data-driven per size, measured interleaved on hardware
(scripts/ablate_engines.py, scripts/ablate_large.py; tables in
docs/ABLATION.md) — not a global flag:

* fused sizes (n <= FUSED_MAX): the XLA-scheduled jnp four-step
  (kernels/fused_jnp.py) — beat the hand-written fused kernels at every
  measured (B, n), so those kernels were retired in round 2.
* stage A: the Pallas kernel (kernels/fused.py) — beats the einsum form
  at every staged size (2^20: 96.6 vs 128.8 us).
* stage B: the einsum four-step with the output digit reversal FOLDED into
  the final dot's output permutation (kernels/fused_jnp.py:stage_b_jnp) —
  beats row transforms + a separate XLA transpose at every staged size
  (2^20: 89.1 vs 103.5 us); a fused Pallas version of the same idea lost
  7x to Mosaic layout constraints and was retired (docs/ABLATION.md §5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import config
from ..config import DIRECT_MAX, FUSED_MAX
from ..plan import (
    get_fused_plan,
    get_irfft_plan,
    get_pack_tables,
    get_stage_a_plan,
    get_whole_packed_plan,
    get_whole_plan,
    half_spectrum_applies,
    irfft_half_applies,
    irfft_half_staged_applies,
    rfft_pack_applies,
    use_folded_layout,
    whole_kernel_applies,
    wide_split_applies,
)
from .fused import stage_a, whole_transform, whole_transform_packed
from .fused_jnp import (
    fused_fft_jnp,
    fused_fft_jnp_folded,
    fused_fft_jnp_half,
    fused_irfft_jnp,
    stage_b_half_jnp,
    stage_b_irfft_jnp,
    stage_b_jnp,
)

__all__ = ["transform_any", "inverse_real", "inverse_real_half"]


# ── Autodiff over the Pallas stage-A kernel ───────────────────────────────────
#
# Every other op in the transform paths is a jnp graph XLA can differentiate
# and transpose by itself; the one opaque piece is the stage-A pallas_call.
# The transform is LINEAR, so its JVP is itself — computed here as the jnp
# einsum engine (stage_a_jnp), which reverse mode can transpose.  Primal
# execution keeps the measured kernel; tangent/cotangent passes pay the
# einsum form's cost.  transform_any's staged path no longer relies on this
# seam (it routes BOTH AD modes through the measured dispatch via
# linear_call + the DFT's F^T = F symmetry — see transform_any); this seam
# remains the AD story for inverse_real's fold paths, whose linear map has
# no such self-transpose identity.

_STAGE_A_TABLE_KEYS = (
    "f1r", "f1i", "f1s", "f1d", "two_r", "two_i", "twi_r", "twi_i", "twr", "twi"
)


@partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5, 6, 7))
def _stage_a_core(x3r, x3i, tabs, n1, n2, ct, rows, col_tiles):
    t = dict(tabs)
    t["ct"] = ct
    return stage_a(x3r, x3i, n1, n2, t, ct, col_tiles=col_tiles, rows=rows)


@_stage_a_core.defjvp
def _stage_a_core_jvp(n1, n2, ct, rows, col_tiles, primals, tangents):
    x3r, x3i, tabs = primals
    tx3r, tx3i, _ = tangents
    y = _stage_a_core(x3r, x3i, tabs, n1, n2, ct, rows, col_tiles)
    from .fused_jnp import stage_a_jnp

    tyr, tyi = stage_a_jnp(tx3r, None if x3i is None else tx3i, tabs)
    if rows is not None:
        tyr, tyi = tyr[:, :rows, :], tyi[:, :rows, :]
    if col_tiles is not None:
        tyr, tyi = tyr[:, :, : col_tiles * ct], tyi[:, :, : col_tiles * ct]
    return y, (tyr, tyi)


def _stage_a_ad(x3r, x3i, plan, rows=None, col_tiles=None):
    """Differentiable wrapper around the stage-A kernel (see block comment)."""
    tabs = {k: plan[k] for k in _STAGE_A_TABLE_KEYS if k in plan}
    return _stage_a_core(x3r, x3i, tabs, plan["n1"], plan["n2"], plan["ct"], rows, col_tiles)


def inverse_real(xr, xi, n: int, scale: float | None = None):
    """Real-output inverse transform of a HERMITIAN (B, n) spectrum.

    The real-output dual of ``transform_any(xr, None, ...)``'s real-input
    paths: every consumer that inverts a real signal's spectrum (irfft,
    convolution/filtering epilogues, istft) discards the imaginary part,
    so for n >= tuning.irfft_half_min the conjugate half of the INPUT is
    folded before the matmuls (kernels/fused_jnp.py:fused_irfft_jnp) —
    half the stage-1 contraction, real-only stage 2, natural output order.
    Measured v5e: 1.11-1.46x at every (B, n) with n >= 2^15; below that
    the full inverse's better-tiled batched contractions win, so this
    falls back to ``transform_any`` + drop imag (docs/ABLATION.md §14).

    Unnormalized unless ``scale`` is given (1/n for numpy irfft
    semantics); at folded sizes the scale lives in the plan tables (zero
    extra passes).  Correct ONLY for Hermitian input — garbage in the
    conjugate half silently changes the answer rather than erroring.
    """
    if n <= FUSED_MAX and n >= 16 and irfft_half_applies(n):
        return fused_irfft_jnp(xr, xi, get_irfft_plan(n, scale=scale))
    if n > FUSED_MAX and irfft_half_staged_applies(n):
        from ..plan import get_stage_b_irfft_plan

        bt = get_stage_b_irfft_plan(n, scale=scale)
        if bt is not None:
            from .fused_jnp import irfft_fold_columns, stage_b_irfft_from_half

            b = xr.shape[0]
            plan = get_stage_a_plan(n, +1)
            n1, n2, ct = plan["n1"], plan["n2"], plan["ct"]
            x3r = xr.reshape(b, n1, n2)
            x3i = xi.reshape(b, n1, n2)
            # Hermitian input makes the post-twiddle stage-A output itself
            # conjugate-symmetric over columns (Z[k1, n2-c] = conj(Z[k1, c]),
            # phase proof in plan.get_stage_b_irfft_plan), so stage A — the
            # dominant staged cost — runs on only the first ceil((n2/2+1)/ct)
            # column tiles and the rest reconstruct as cheap axis-reversals
            # (kernels/fused_jnp.py:irfft_fold_columns).
            tiles = -(-(n2 // 2 + 1) // ct)
            if config.PRECISION == "high":
                from .fused_jnp import stage_a_jnp

                yr, yi = stage_a_jnp(x3r, x3i, plan)
                yr = yr[:, :, : tiles * ct]
                yi = yi[:, :, : tiles * ct]
            else:
                yr, yi = _stage_a_ad(x3r, x3i, plan, col_tiles=tiles)
            g_r, g_i = irfft_fold_columns(yr, yi, bt)
            # Per-row Hermitian fold stage B: half the stage-1 contraction,
            # real-only stage 2, digit reversal folded into the output order.
            return stage_b_irfft_from_half(g_r, g_i, bt)
    yr, _ = transform_any(xr, xi, n, +1, scale=scale)
    return yr


def inverse_real_half(xr, xi, n: int, scale: float | None = None):
    """Real-output inverse from the ONE-SIDED (B, h = n//2 + 1) spectrum.

    The entry point for consumers that hold rfft-style half spectra
    (irfft_device, istft).  At direct sizes (n <= DIRECT_MAX) the Hermitian
    symmetry folds into the DFT tables themselves: two real matmuls with
    contraction h — half the MXU passes of the mirror + full-inverse form
    and zero mirror relayout (1.4-2.75x measured at every (B, n <= 512),
    docs/ABLATION.md §16).  Larger n: cheap rev+concat Hermitian
    reconstruction + :func:`inverse_real`, whose fold dispatch reads back
    only the k1 <= n1/2 grid columns at fold sizes (so XLA dead-code-
    eliminates most of the mirror).  DC/Nyquist imaginary parts are
    ignored (numpy ``irfft`` semantics) on every path.
    """
    import jax.numpy as jnp

    h = n // 2 + 1
    if xr.shape[-1] != h:
        raise ValueError(f"inverse_real_half expects {h} bins for n={n}, got {xr.shape[-1]}")
    if n <= DIRECT_MAX:
        from ..plan import get_irfft_direct_k128_plan, get_irfft_direct_plan
        from ..tuning import get_tuning

        from .fused_jnp import irfft_direct_half_jnp, irfft_direct_half_k128_jnp

        if n >= 256 and get_tuning().irfft_direct_k128:
            # Lane-exact variant: K = n/2 dots + Nyquist broadcast — the
            # h-deep contraction MXU-pads 129 -> 256; measured 1.43x at
            # the istft hot shape (253, 256) on v5e (docs/ABLATION.md §25).
            return irfft_direct_half_k128_jnp(xr, xi, get_irfft_direct_k128_plan(n, scale))
        return irfft_direct_half_jnp(xr, xi, get_irfft_direct_plan(n, scale))
    # NOTE (round 4, scripts/ablate_irfft_fused.py): assembling the
    # (B, n2, h1) fold grid STRAIGHT from the one-sided bins
    # (fused_jnp.fused_irfft_half_jnp) was measured and REJECTED — its
    # revs + concats land on a 129-wide minor axis (odd lane tile), which
    # costs more than the full mirror's aligned flat-axis concats save
    # (n=65536: 10.9 vs 8.3 us through the same harness).  The mirror
    # form below stays the dispatch; the direct-grid engine remains
    # implemented + oracle-tested for layout-different toolchains.
    # Hermitian reconstruction: X[n-k] = conj(X[k]); DC/Nyquist forced real.
    # The tail rev(x[1:h-1]) equals the first h-2 elements of the flat
    # reversal of x[:n/2] — a POW2-length reversal that runs as a cheap
    # (rows, 128) two-axis rev instead of the pathological flat lane
    # reversal (52-475 us at n=65536 vs ~1 us, docs/ABLATION.md §11).
    from jax import lax

    xi = xi.at[..., 0].set(0.0).at[..., h - 1].set(0.0)
    half = n // 2
    b = xr.shape[0]
    rows = max(half // 128, 1)

    def rev_half(a):
        return lax.rev(a[..., :half].reshape(b, rows, -1), (1, 2)).reshape(b, half)

    full_r = jnp.concatenate([xr, rev_half(xr)[..., : half - 1]], axis=-1)
    full_i = jnp.concatenate([xi, -rev_half(xi)[..., : half - 1]], axis=-1)
    return inverse_real(full_r, full_i, n, scale=scale)


def transform_any(xr, xi, n: int, sign: int, scale: float | None = None):
    """Split-complex transform of each row of a (B, n) batch, any pow2 n >= 2.

    ``xi`` may be None (real input).  Unnormalized unless ``scale`` is
    given (e.g. 1/n for a normalized inverse) — at fused sizes the scale
    is folded into the last matmul's table (zero extra HBM passes; exact
    for power-of-two scales); the staged path applies it as an epilogue.
    Natural output order.
    """
    if xi is None and sign == -1 and n >= 8 and rfft_pack_applies(xr.shape[0], n):
        return _real_packed_fft(xr, n, scale)
    if n <= FUSED_MAX:
        b = xr.shape[0]
        if whole_kernel_applies(b, n) and config.PRECISION != "high":
            # Latency-bound band: the ENTIRE four-step in ONE pallas_call
            # (kernels/fused.py:whole_transform) — the reference's
            # single-dispatch design translated (src/butterfly.rs:84-147).
            # AD routes through the measured kernel exactly like the staged
            # path: the DFT is a symmetric complex-linear map (F^T = F), so
            # the real-form transpose is conj . F_sign . conj; the folded
            # real ``scale`` carries through the transpose unchanged.
            # ("high" precision falls through: Mosaic has no 3-pass
            # lowering, same rule as the staged stage A.)
            from ..tuning import get_tuning

            if n <= get_tuning().whole_packed_n_max:
                # Packed single-operand variant: one table DMA issue +
                # stacked dots — wins where per-operand DMA-issue
                # serialization dominates (n=1024 on v5e, §24).
                kern = whole_transform_packed
                plan = get_whole_packed_plan(n, sign, scale=scale)
            else:
                kern = whole_transform
                plan = get_whole_plan(n, sign, scale=scale)
            if xi is None:
                return jax.custom_derivatives.linear_call(
                    lambda _, x: kern(x, None, plan),
                    lambda _, ct: kern(ct[0], -ct[1], plan)[0],
                    (),
                    xr,
                )

            def _w_transpose(_, ct):
                gr, gi = kern(ct[0], -ct[1], plan)
                return gr, -gi

            return jax.custom_derivatives.linear_call(
                lambda _, x: kern(x[0], x[1], plan),
                _w_transpose,
                (),
                (xr, xi),
            )
        if xi is None and half_spectrum_applies(n):
            # Real input at big fused sizes: compute only the k1 <= n1/2
            # spectrum half and mirror the rest (Hermitian symmetry, valid
            # for either sign) — halves the dominant second matmul and both
            # trailing transposes; 1.04-1.35x measured at every (B, n) with
            # n >= 2^15 (docs/ABLATION.md §13).  The gate (>= 2^15) is
            # above the wide-split region, so the balanced transpose-form
            # split is always the right base here; ``scale`` folds into the
            # plan's f2 tables like the full-spectrum forms.
            plan = get_fused_plan(n, sign, wide=False, scale=scale)
            if plan.kind == "fourstep":
                return fused_fft_jnp_half(xr, plan)
        # Split and layout choices are the shared measured predicates in
        # plan.py (single source of truth with describe_plan; evidence in
        # docs/ABLATION.md §7): wide batches take the full-lane n2=128
        # split; the folded layout (digit reversal as the final einsum's
        # output permutation, zero transposes) wins everywhere except
        # single/double-signal big n, where XLA schedules the explicit
        # transposes better and far more stably (iqr 0.03 vs ~1.5 us).
        plan = get_fused_plan(n, sign, wide=wide_split_applies(b, n), scale=scale)
        if plan.kind == "fourstep" and use_folded_layout(b, n):
            return fused_fft_jnp_folded(xr, xi, plan)
        return fused_fft_jnp(xr, xi, plan)

    if scale is not None:
        # Staged sizes: explicit epilogue (the fused-size table fold does
        # not reach the Pallas stage-A tables).
        yr, yi = transform_any(xr, xi, n, sign)
        s = jnp.float32(scale)
        return yr * s, yi * s

    # Staged sizes: route BOTH autodiff modes through the measured kernels.
    # The stage-A pallas_call has no transpose rule, and letting reverse
    # mode transpose the einsum tangent graph composes ~2.2x slower than
    # the shipped dispatch (172 vs 53 us grad at 2^20; docs/ABLATION.md
    # §12's composition collapse).  The transform is a SYMMETRIC complex-
    # linear map (DFT matrix: F^T = F), so the real-form transpose is
    # conj . T . conj — i.e. the same measured transform on the conjugated
    # cotangent.  linear_call makes the tangent pass f itself and the
    # transpose the conjugated call, so jvp, vjp, and grad all run the
    # Pallas dispatch.  linear_call has no vmap rule; the API is already
    # batched over rows, so vmap over a staged transform is unsupported —
    # fold extra axes into B instead.
    if xi is None:
        # x real: M = [Re F; Im F], so M^T [cr; ci] = Re(F_sign(cr - i*ci)).
        # (A Hermitian-projection form riding inverse_real was measured and
        # LOST — 133 vs 96 us at 2^20: the two (rows, 128) mirror+roll
        # passes cost ~24 us each, eating the fold's savings.)
        return jax.custom_derivatives.linear_call(
            lambda _, x: _staged(x, None, n, sign),
            lambda _, ct: _staged(ct[0], -ct[1], n, sign)[0],
            (),
            xr,
        )

    def _transpose(_, ct):
        gr, gi = _staged(ct[0], -ct[1], n, sign)
        return gr, -gi

    return jax.custom_derivatives.linear_call(
        lambda _, x: _staged(x[0], x[1], n, sign), _transpose, (), (xr, xi)
    )


def _staged(xr, xi, n: int, sign: int):
    """The staged (n > FUSED_MAX) dispatch body; see transform_any."""
    b = xr.shape[0]
    # Full-range stage A: wider column tiles at big n2 (+3-4% at
    # 2^20/2^22, docs/ABLATION.md §26); the half-range irfft path keeps
    # the finer default tile (its mirror-skip granularity).
    from ..plan import stage_a_ct_full_range

    plan = get_stage_a_plan(n, sign, ct=stage_a_ct_full_range(n))
    n1, n2 = plan["n1"], plan["n2"]

    # Real input + half-spectrum stage B: the stage-A output is conjugate-
    # symmetric over k1 (real x => S[n1-k1, c] = conj(S[k1, c])) and
    # stage_b_half_jnp reads only k1 <= n1/2, so the kernel computes just
    # the first ceil-to-sublane(n1/2 + 1) rows — ~0.56x the dominant
    # stage-A matmul (docs/ABLATION.md §13 addendum).
    half_rows = None
    if (
        xi is None
        and half_spectrum_applies(n)
        and plan["stage_b"] is not None
        and config.PRECISION != "high"
    ):
        half_rows = -(-(n1 // 2 + 1) // 8) * 8

    # Stage A: Y[k1, c] = sum_a F1[k1, a] x[a, c] * W_n^(k1*c), one pass.
    x3r = xr.reshape(b, n1, n2)
    x3i = None if xi is None else xi.reshape(b, n1, n2)
    if config.PRECISION == "high":
        # Mosaic has no 3-pass lowering, so the Pallas stage-A kernel would
        # silently run 6-pass HIGHEST under "high" — making the speed dial's
        # effect size-dependent.  Route stage A through the jnp engine
        # (which honors lax.Precision.HIGH) so "high" means the same ~2x
        # compute cut at every size (round-2 verdict item 8).
        from .fused_jnp import stage_a_jnp

        yr, yi = stage_a_jnp(x3r, x3i, plan)
    else:
        # Stage A stays the Pallas kernel with the twiddle applied in-kernel:
        # measured equal to deferring the twiddle into stage B's fusion, and
        # 1.5x faster than composing XLA's own 2-D dots into the graph — see
        # docs/ABLATION.md §12 for the full variant matrix.
        yr, yi = _stage_a_ad(x3r, x3i, plan, rows=half_rows)

    if plan["stage_b"] is not None:
        if xi is None and half_spectrum_applies(n):
            # Real input: k1 <= n1/2 slice + Hermitian mirror epilogue —
            # halves stage B's matmuls and the digit-reversal transpose
            # (1.18-1.31x measured at every staged size, ABLATION.md §13).
            return stage_b_half_jnp(yr, yi, n1, n2, plan["stage_b"])
        # Stage B with the digit reversal folded into the final einsum's
        # output permutation — no separate HBM transpose pass.
        return stage_b_jnp(yr, yi, n1, n2, plan["stage_b"])

    # Stage B: row DFTs of length n2 (k1-major rows are already contiguous).
    rr, ri = transform_any(yr.reshape(b * n1, n2), yi.reshape(b * n1, n2), n2, sign)

    # Output digit reversal: flat index k = k1 + n1*k2.
    out_r = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    out_i = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return out_r, out_i


def _real_packed_fft(xr, n: int, scale):
    """Length-n real forward FFT as ONE length-n/2 complex FFT + O(n) epilogue.

    The classic real-input packing: z[j] = x[2j] + i*x[2j+1] (a static
    stride-2 reshape — no gather), Z = FFT_{n/2}(z), then the exact
    recombination

        E[k] = (Z[k] + conj(Z[-k])) / 2        (spectrum of the evens)
        O[k] = -i*(Z[k] - conj(Z[-k])) / 2     (spectrum of the odds)
        X[k]       = E[k] + W_n^k * O[k]
        X[k + n/2] = E[k] - W_n^k * O[k]

    Halving the transform length halves EVERY matmul stage's FLOPs — on the
    MXU-pass-bound sizes this is a near-2x wall-clock win (measured v5e,
    docs/ABLATION.md §11).  The optional ``scale`` (a normalized forward)
    folds into the half/twiddle factors, costing zero extra passes.

    Data movement is the trap here, not FLOPs — measured v5e (§11):

    * The stride-2 even/odd split as ANY lane-shuffle form (strided slice,
      reshape+index, stack) costs 35-50 us at n=65536; as a (256, 256)
      0/1 PERMUTATION MATMUL it costs ~1 us and block-local evens/odds land
      lane-contiguous, so the global split falls out of two aligned slices.
    * A flat ``lax.rev`` (or worse, a negative-step slice = gather) costs
      52-475 us; the SAME reversal reshaped to (rows, 128) and reversed
      over both trailing axes costs 0.9 us.
    """
    from jax import lax

    from ..plan import deinterleave_matrix

    b = xr.shape[0]
    h = n // 2
    # Even/odd split on the MXU: block-local permutation, then 128-aligned
    # slices reassemble the global z = x[0::2] + i*x[1::2].
    perm = deinterleave_matrix()
    xp = jnp.dot(
        xr.reshape(b * (n // 256), 256),
        perm,
        precision=lax.Precision.HIGHEST,  # exact: P is 0/1
        preferred_element_type=jnp.float32,
    ).reshape(b, n // 256, 256)
    zr = xp[:, :, :128].reshape(b, h)
    zi = xp[:, :, 128:].reshape(b, h)
    Zr, Zi = transform_any(zr, zi, h, -1)
    # Mirrored index m(k) = (h - k) mod h = roll(reverse(Z), 1).  The
    # reversal runs on a (rows, 128) view over BOTH trailing axes (equal to
    # the flat reversal, but a cheap 2-D relayout instead of a pathological
    # flat one).
    rows = max(h // 128, 1)
    Zr_m = jnp.roll(lax.rev(Zr.reshape(b, rows, -1), (1, 2)).reshape(b, h), 1, axis=1)
    Zi_m = jnp.roll(lax.rev(Zi.reshape(b, rows, -1), (1, 2)).reshape(b, h), 1, axis=1)
    hs = jnp.float32(0.5 if scale is None else 0.5 * scale)
    wr, wi = get_pack_tables(n)
    wrs, wis = wr * hs, wi * hs  # trace-time constant fold
    Er = (Zr + Zr_m) * hs
    Ei = (Zi - Zi_m) * hs
    O2r = Zi + Zi_m  # 2*Re(O); the 1/2 lives in the scaled twiddle
    O2i = Zr_m - Zr  # 2*Im(O)
    Tr = wrs * O2r - wis * O2i
    Ti = wrs * O2i + wis * O2r
    out_r = jnp.concatenate([Er + Tr, Er - Tr], axis=1)
    out_i = jnp.concatenate([Ei + Ti, Ei - Ti], axis=1)
    return out_r, out_i
