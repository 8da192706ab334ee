"""Large-N transforms: recursive four-step factorization at the JAX level.

The reference handles growing N with more outer radix-4 dispatches
(``src/fft.rs:93-127``) and tops out its benchmarks at N = 65,536.  Here,
transforms beyond FUSED_MAX are factored as n = n1 * n2 with both factors
fused-kernel-sized, and the two passes of shorter transforms are dispatched
over the reshaped batch — the classic Bailey/four-step algorithm.  The
inter-pass data movement is a pair of (B, n1, n2) transposes that XLA executes
as HBM-bandwidth transpose fusions, replacing the strided cross-tile
butterflies a GPU would use (``src/butterfly.rs:341-414``).  This extends
coverage to the 2^20+ range called for by BASELINE.json's north star.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import config
from ..config import FUSED_MAX, RFFT_MIN
from ..plan import get_fused_plan, get_stage_a_plan, stage_a_col_tile
from .fused import fused_fft, stage_a
from .fused_jnp import fused_fft_jnp, stage_a_jnp

__all__ = ["transform_any"]


def transform_any(xr, xi, n: int, sign: int):
    """Split-complex transform of each row of a (B, n) batch, any pow2 n >= 2.

    ``xi`` may be None (real input).  Unnormalized; natural output order.

    Engine selection (``config.ENGINE``, measured on v5e — see
    kernels/fused_jnp.py): the default "auto" runs the fused transforms as
    XLA-scheduled jnp ops and keeps the Pallas kernel only for the large-N
    column stage, where it wins.

    Above FUSED_MAX the transform runs STAGED: a column-DFT-plus-twiddle
    stage over the (n1, n2) matrix view (a LEFT matmul — no transposes, the
    column digit never leaves the lane axis), then the fused row transforms
    of length n2, then one output digit-reversal transpose.  Compared to a
    transpose-based recursion this eliminates two of the three HBM transpose
    passes and the separate twiddle pass (measured 5.5x at 2^20).
    """
    if config.ENGINE == "pallas" and xi is None and sign == -1 and RFFT_MIN <= n <= 2 * FUSED_MAX:
        # The fused rfft kernel covers up to TWICE the complex fused maximum
        # (its half-length transform is what must fit).
        from ..plan import get_rfft_plan
        from .fused import fused_rfft

        return fused_rfft(xr, get_rfft_plan(n))
    if n <= FUSED_MAX:
        if config.ENGINE == "pallas":
            return fused_fft(xr, xi, get_fused_plan(n, sign))
        # Wide batches prefer the full-lane n2=128 split (see get_fused_plan).
        wide = xr.shape[0] >= 16 and n <= 16384
        return fused_fft_jnp(xr, xi, get_fused_plan(n, sign, wide=wide))

    b = xr.shape[0]
    plan = get_stage_a_plan(n, sign)
    n1, n2 = plan["n1"], plan["n2"]

    # Stage A: Y[k1, c] = sum_a F1[k1, a] x[a, c] * W_n^(k1*c), one pass.
    x3r = xr.reshape(b, n1, n2)
    x3i = None if xi is None else xi.reshape(b, n1, n2)
    if config.ENGINE == "jnp":
        yr, yi = stage_a_jnp(x3r, x3i, plan)
    else:
        yr, yi = stage_a(x3r, x3i, n1, n2, plan, stage_a_col_tile(n1, n2))

    # Stage B: row DFTs of length n2 (k1-major rows are already contiguous).
    rr, ri = transform_any(yr.reshape(b * n1, n2), yi.reshape(b * n1, n2), n2, sign)

    # Output digit reversal: flat index k = k1 + n1*k2.
    out_r = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    out_i = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return out_r, out_i
