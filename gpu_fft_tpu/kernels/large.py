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
from ..plan import get_fused_plan, get_large_twiddle, get_untangle
from .fused import fused_fft

__all__ = ["transform_any"]


def _rfft_real_large(x, n: int):
    """Forward FFT of real rows via the half-length complex transform.

    Packs even/odd samples into a complex signal of length h = n/2, runs ONE
    complex transform, and untangles the conjugate-symmetric spectrum:

        E[k] = (Z[k] + conj(Z[(h-k)%h])) / 2      (FFT of even samples)
        O[k] = -i/2 * (Z[k] - conj(Z[(h-k)%h]))    (FFT of odd samples)
        X[k]     = E[k] + W_n^k O[k]
        X[k + h] = E[k] - W_n^k O[k]

    This halves the dominant full-precision matmul work of the forward path —
    an optimization the reference never had (it always runs the full complex
    transform on zero imaginary input, ``src/fft.rs:59``).
    """
    from jax import lax

    from ..plan import PACK_TILE, get_pack_matrix

    b = x.shape[0]
    h = n // 2
    # Even/odd deinterleave via an exact 0/1 selection matmul (lane-strided
    # slicing is a slow gather on TPU; the MXU does this at memory speed).
    # Within each PACK_TILE lane tile: out[:, :t/2] = evens, out[:, t/2:] = odds,
    # and tile-local even index j maps to global packed index i*(t/2)+j — the
    # natural order of the packed signal.
    t = PACK_TILE
    sel = jnp.asarray(get_pack_matrix())
    xm = x.reshape(b * (n // t), t)
    packed = jnp.dot(xm, sel, precision=lax.Precision.HIGHEST, preferred_element_type=jnp.float32)
    p3 = packed.reshape(b, n // t, t)
    zr = p3[:, :, : t // 2].reshape(b, h)
    zi = p3[:, :, t // 2 :].reshape(b, h)
    zr, zi = transform_any(zr, zi, h, -1)
    # Z[(h-k) % h]: flip then roll (free in XLA, fused into the untangle).
    rr = jnp.roll(jnp.flip(zr, axis=1), 1, axis=1)
    ri = jnp.roll(jnp.flip(zi, axis=1), 1, axis=1)
    er = 0.5 * (zr + rr)
    ei = 0.5 * (zi - ri)
    o_r = 0.5 * (zi + ri)
    o_i = -0.5 * (zr - rr)
    ur, ui = get_untangle(n)
    tr = o_r * ur[None] - o_i * ui[None]
    ti = o_r * ui[None] + o_i * ur[None]
    yr = jnp.concatenate([er + tr, er - tr], axis=1)
    yi = jnp.concatenate([ei + ti, ei - ti], axis=1)
    return yr.reshape(b, n), yi.reshape(b, n)


def transform_any(xr, xi, n: int, sign: int):
    """Split-complex transform of each row of a (B, n) batch, any pow2 n >= 2.

    ``xi`` may be None (real input).  Unnormalized; natural output order.
    """
    if xi is None and sign == -1 and n >= RFFT_MIN:
        if n <= 2 * FUSED_MAX:
            from ..plan import get_rfft_plan
            from .fused import fused_rfft

            return fused_rfft(xr, get_rfft_plan(n))
        return _rfft_real_large(xr, n)
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
