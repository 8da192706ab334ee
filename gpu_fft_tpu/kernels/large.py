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

import jax.numpy as jnp

from ..config import FUSED_MAX
from ..plan import (
    get_fused_plan,
    get_stage_a_plan,
    stage_a_col_tile,
    use_folded_layout,
    wide_split_applies,
)
from .fused import stage_a
from .fused_jnp import fused_fft_jnp, fused_fft_jnp_folded, stage_b_jnp

__all__ = ["transform_any"]


def transform_any(xr, xi, n: int, sign: int, scale: float | None = None):
    """Split-complex transform of each row of a (B, n) batch, any pow2 n >= 2.

    ``xi`` may be None (real input).  Unnormalized unless ``scale`` is
    given (e.g. 1/n for a normalized inverse) — at fused sizes the scale
    is folded into the last matmul's table (zero extra HBM passes; exact
    for power-of-two scales); the staged path applies it as an epilogue.
    Natural output order.
    """
    if n <= FUSED_MAX:
        b = xr.shape[0]
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

    b = xr.shape[0]
    if scale is not None:
        # Staged sizes: explicit epilogue (the fused-size table fold does
        # not reach the Pallas stage-A tables).
        yr, yi = transform_any(xr, xi, n, sign)
        s = jnp.float32(scale)
        return yr * s, yi * s
    plan = get_stage_a_plan(n, sign)
    n1, n2 = plan["n1"], plan["n2"]

    # Stage A: Y[k1, c] = sum_a F1[k1, a] x[a, c] * W_n^(k1*c), one pass.
    x3r = xr.reshape(b, n1, n2)
    x3i = None if xi is None else xi.reshape(b, n1, n2)
    yr, yi = stage_a(x3r, x3i, n1, n2, plan, stage_a_col_tile(n1, n2))

    if plan["stage_b"] is not None:
        # Stage B with the digit reversal folded into the final einsum's
        # output permutation — no separate HBM transpose pass.
        return stage_b_jnp(yr, yi, n1, n2, plan["stage_b"])

    # Stage B: row DFTs of length n2 (k1-major rows are already contiguous).
    rr, ri = transform_any(yr.reshape(b * n1, n2), yi.reshape(b * n1, n2), n2, sign)

    # Output digit reversal: flat index k = k1 + n1*k2.
    out_r = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    out_i = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return out_r, out_i
