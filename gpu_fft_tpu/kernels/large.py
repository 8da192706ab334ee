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

from ..config import FUSED_MAX, RFFT_MIN
from ..plan import get_fused_plan, get_large_twiddle
from .fused import fused_fft

__all__ = ["transform_any"]


def transform_any(xr, xi, n: int, sign: int):
    """Split-complex transform of each row of a (B, n) batch, any pow2 n >= 2.

    ``xi`` may be None (real input).  Unnormalized; natural output order.
    """
    if xi is None and sign == -1 and RFFT_MIN <= n <= 2 * FUSED_MAX:
        # Above 2*FUSED_MAX the JAX-level rfft wrapper measures SLOWER than
        # the plain real-first-stage recursion (extra pack/untangle HBM
        # passes dominate), so it is not used there.
        from ..plan import get_rfft_plan
        from .fused import fused_rfft

        return fused_rfft(xr, get_rfft_plan(n))
    if n <= FUSED_MAX:
        return fused_fft(xr, xi, get_fused_plan(n, sign))

    b = xr.shape[0]
    twr, twi, n1, n2 = get_large_twiddle(n, sign)

    # Column DFT: rows of x^T are the n2 columns, each of length n1.
    xt_r = jnp.swapaxes(xr.reshape(b, n1, n2), 1, 2).reshape(b * n2, n1)
    xt_i = (
        None if xi is None else jnp.swapaxes(xi.reshape(b, n1, n2), 1, 2).reshape(b * n2, n1)
    )
    pr, pi = transform_any(xt_r, xt_i, n1, sign)

    # Twiddle W_n^(b_digit * k1), then row DFT over the n2 axis.
    p3r = pr.reshape(b, n2, n1)
    p3i = pi.reshape(b, n2, n1)
    zr = p3r * twr[None] - p3i * twi[None]
    zi = p3r * twi[None] + p3i * twr[None]
    qr = jnp.swapaxes(zr, 1, 2).reshape(b * n1, n2)
    qi = jnp.swapaxes(zi, 1, 2).reshape(b * n1, n2)
    rr, ri = transform_any(qr, qi, n2, sign)

    # Output digit reversal: flat index k = k1 + n1*k2.
    yr = jnp.swapaxes(rr.reshape(b, n1, n2), 1, 2).reshape(b, n)
    yi = jnp.swapaxes(ri.reshape(b, n1, n2), 1, 2).reshape(b, n)
    return yr, yi
