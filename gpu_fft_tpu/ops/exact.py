"""Exact arbitrary-length FFT: mixed-radix four-step or Bluestein chirp-z.

The reference (and this library's ``fft``) zero-pads non-power-of-two
signals to the next power of two — which computes a DIFFERENT spectrum
(padded-length bins).  ``fft_exact`` computes the true length-n DFT for ANY
n >= 1, choosing between two exact strategies by modeled FLOPs:

* **Mixed-radix four-step** (``_mixed_fft``): whenever n has a balanced
  divisor pairing n = n1 * n2 with both digits <= MIXED_DIGIT_MAX, the
  transform is the SAME two-matmul + twiddle factorization the pow2 fused
  path uses (kernels/fused_jnp.py — its math never required powers of two),
  with (n1, n1) and (n2, n2) direct DFT tables.  A digit is a direct
  matmul, so it need NOT be smooth or prime-free: n = 1009^2 splits as
  1009 x 1009 even though 1009 is prime.  For audio-style lengths this
  crushes the chirp path's 2.7x padding — n = 48,000 runs as 240 x 200
  instead of two 131,072-point transforms.
* **Bluestein chirp-z** (``_bluestein``): lengths with only lopsided
  divisor pairings (primes, 2 * large-prime, ...) re-express the DFT as a
  circular convolution of power-of-two size m = next_pow2(2n - 1):

      X[k] = w*[k] . sum_j (x[j] w*[j]) . w[(k-j)],  w[j] = e^{i pi j^2 / n}

  realized as  a = x * conj(w);  X = conj(w) * IFFT_m(FFT_m(a) * B)
  with B = FFT_m of the circularly-wrapped chirp.

Accuracy: every table angle is reduced mod the period in exact int64 before
the f64 exponential (j^2 overflows f64's integer range long before n's
limit), so table error stays at 1/2 ulp; end-to-end error is a few f32 ulps
times log(m), comfortably inside the 5*log2(m)*eps-style gates.

This is an extension beyond reference parity — the reference has no exact
non-pow2 path at all.
"""

from __future__ import annotations

import functools
import math

import numpy as np

from ..config import MAX_N

__all__ = ["fft_exact", "ifft_exact", "fft_exact_device", "ifft_exact_device"]


def _chirp_split(n: int, sign: int) -> tuple[np.ndarray, np.ndarray]:
    """w[j] = exp(sign * i*pi*j^2/n) as split f32, exponent reduced mod 2n."""
    j = np.arange(n, dtype=np.int64)
    red = (j * j) % (2 * n)  # exact in int64 for n <= 2^31
    ang = (np.pi / n) * red.astype(np.float64)
    if sign < 0:
        return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _bluestein_plan(n: int, sign: int) -> dict:
    """Cached NumPy tables: the chirp w (length n) and the pow2-domain
    kernel spectrum B = FFT_m(wrapped conj-chirp), both f64-generated."""
    m = 1
    while m < 2 * n - 1:
        m *= 2
    wr, wi = _chirp_split(n, sign)
    # Kernel b[j] = exp(-sign * i*pi*j^2/n) wrapped circularly: b[m-j] = b[j].
    br, bi = _chirp_split(n, -sign)
    kern = np.zeros(m, dtype=np.complex128)
    bc = br.astype(np.float64) + 1j * bi.astype(np.float64)
    kern[:n] = bc
    kern[m - n + 1:] = bc[1:][::-1]
    kspec = np.fft.fft(kern)
    return {
        "m": m,
        "wr": wr, "wi": wi,
        "kr": kspec.real.astype(np.float32), "ki": kspec.imag.astype(np.float32),
    }


def _bluestein(xr, xi, n: int, sign: int):
    """Split-complex exact length-n transform of (B, n) rows (xi may be None)."""
    import jax.numpy as jnp

    from ..kernels.large import transform_any

    p = _bluestein_plan(n, sign)
    m = p["m"]
    wr, wi = p["wr"], p["wi"]
    # a = x * w  (w already carries the transform sign)
    if xi is None:
        ar = xr * wr
        ai = xr * wi
    else:
        ar = xr * wr - xi * wi
        ai = xr * wi + xi * wr
    pad = ((0, 0), (0, m - n))
    ar = jnp.pad(ar, pad)
    ai = jnp.pad(ai, pad)
    # Circular convolution with the chirp kernel through the pow2 path.
    fr, fi = transform_any(ar, ai, m, -1)
    cr = fr * p["kr"] - fi * p["ki"]
    ci = fr * p["ki"] + fi * p["kr"]
    gr, gi = transform_any(cr, ci, m, +1)  # unnormalized inverse
    s = np.float32(1.0 / m)
    gr = gr[:, :n] * s
    gi = gi[:, :n] * s
    # X = w * conv result
    return gr * wr - gi * wi, gr * wi + gi * wr


# Largest direct-DFT digit of the mixed-radix path.  A digit d costs four
# (d, d) f32 tables (16*d^2 bytes) and makes the stage contraction d; 1024
# keeps the table set <= 16 MB and the contraction within the calibrated
# class range while covering every balanced-divisor n <= ~1M.
MIXED_DIGIT_MAX = 1024


@functools.lru_cache(maxsize=None)
def mixed_split(n: int):
    """Most-balanced (n1, n2) with n1 * n2 = n and both <= MIXED_DIGIT_MAX,
    chosen by modeled FLOPs against the Bluestein alternative; None if the
    chirp path wins (or no valid pairing exists).

    The most balanced pairing is (d, n/d) for the largest divisor
    d <= isqrt(n); any smaller divisor has a larger cofactor, so if that
    cofactor exceeds MIXED_DIGIT_MAX no pairing qualifies.  The FLOPs gate
    compares the four-step's 6*n*(n1 + n2) complex-MAC matmuls against the
    measured-dispatch model of Bluestein's two m-point transforms
    (utils/roofline.py:transform_stages) so near-prime pairings like
    (2, 509) only take the matmul form when it actually costs less.
    """
    if n < 4 or n & (n - 1) == 0:
        return None
    d = 0
    for c in range(int(math.isqrt(n)), 1, -1):
        if n % c == 0:
            d = c
            break
    if d < 2 or n // d > MIXED_DIGIT_MAX:
        return None
    n1, n2 = d, n // d
    mixed_flops = 3 * 2.0 * n * (n1 + n2) + 6.0 * n
    m = 1
    while m < 2 * n - 1:
        m *= 2
    from ..utils.roofline import transform_stages

    stages, elem = transform_stages(1, m, real_input=False)
    bluestein_flops = 2.0 * (sum(f for f, _ in stages) + elem) + 4 * 6.0 * n
    return (n1, n2) if mixed_flops < bluestein_flops else None


@functools.lru_cache(maxsize=None)
def _mixed_plan(n: int, sign: int):
    """FusedPlan with mixed (non-pow2) digits: the pow2 fused kernels'
    four-step math (kernels/fused_jnp.py) is digit-size agnostic, so the
    plan is the same table set — (n1, n1) and (n2, n2) direct DFT matrices
    plus the (n2, n1) twiddle — built by the generic f64 generators."""
    from ..kernels.tables import dft_matrix_ext, twiddle_table
    from ..plan import FusedPlan

    n1, n2 = mixed_split(n)
    f1r, f1i, f1s, f1d = dft_matrix_ext(n1, sign)
    f2r, f2i, f2s, f2d = dft_matrix_ext(n2, sign)
    twr, twi = twiddle_table(n2, n1, n, sign)
    tables = {
        "f1r": f1r, "f1i": f1i, "f1s": f1s, "f1d": f1d,
        "f2r": f2r, "f2i": f2i, "f2s": f2s, "f2d": f2d,
        "twr": twr, "twi": twi,
    }
    return FusedPlan(n=n, sign=sign, kind="fourstep", n1=n1, n2=n2, tables=tables)


def _mixed_fft(xr, xi, n: int, sign: int):
    """Exact length-n transform via the mixed-digit four-step (folded form:
    digit reversal as the final einsum's output permutation)."""
    from ..kernels.fused_jnp import fused_fft_jnp_folded

    return fused_fft_jnp_folded(xr, xi, _mixed_plan(n, sign))


def _check_exact_n(n: int) -> None:
    """Validate n for the exact API.  Power-of-two lengths dispatch straight
    to the direct path and only need n <= MAX_N; the Bluestein bound
    (2n - 1 <= MAX_N) applies solely to lengths that actually convolve."""
    if n < 1:
        raise ValueError("fft_exact requires a non-empty signal")
    if n & (n - 1) == 0:
        if n > MAX_N:
            raise ValueError(f"fft_exact length {n} exceeds the supported maximum {MAX_N}")
    elif 2 * n - 1 > MAX_N:
        raise ValueError(
            f"fft_exact length {n} needs a {2 * n - 1}-point convolution, "
            f"beyond the supported maximum {MAX_N}"
        )


def fft_exact_device(x, imag=None):
    """Exact forward DFT of length-n rows for ANY n (device, jit-composable).

    ``x``: (n,) or (B, n) f32.  Returns split-complex arrays of length n —
    the true n-point spectrum, unlike ``fft`` which zero-pads to a power of
    two.  Power-of-two lengths dispatch straight to the direct path.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    n = x.shape[-1]
    _check_exact_n(n)
    xi = None
    if imag is not None:
        xi = jnp.asarray(imag, dtype=jnp.float32)
        xi = xi[None] if squeeze else xi
        if xi.shape != x.shape:
            raise ValueError(
                f"fft_exact: real and imag shapes differ: "
                f"{x.shape if not squeeze else x.shape[1:]} vs "
                f"{xi.shape if not squeeze else xi.shape[1:]}"
            )
    if n >= 2 and n & (n - 1) == 0:
        from ..kernels.large import transform_any

        yr, yi = transform_any(x, xi, n, -1)
    elif n == 1:
        yr = x
        yi = jnp.zeros_like(x) if xi is None else xi
    elif mixed_split(n) is not None:
        yr, yi = _mixed_fft(x, xi, n, -1)
    else:
        yr, yi = _bluestein(x, xi, n, -1)
    return (yr[0], yi[0]) if squeeze else (yr, yi)


def ifft_exact_device(xr, xi):
    """Exact inverse DFT (1/n normalized) for ANY length n (device)."""
    import jax.numpy as jnp

    xr = jnp.asarray(xr, dtype=jnp.float32)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    if xr.shape != xi.shape:
        raise ValueError(f"ifft_exact: shapes differ: {xr.shape} vs {xi.shape}")
    squeeze = xr.ndim == 1
    if squeeze:
        xr, xi = xr[None], xi[None]
    n = xr.shape[-1]
    _check_exact_n(n)
    if n >= 2 and n & (n - 1) == 0:
        from ..kernels.large import transform_any

        yr, yi = transform_any(xr, xi, n, +1)
    elif n == 1:
        yr, yi = xr, xi
    elif mixed_split(n) is not None:
        yr, yi = _mixed_fft(xr, xi, n, +1)
    else:
        yr, yi = _bluestein(xr, xi, n, +1)
    s = jnp.float32(1.0 / n)
    yr = yr * s
    yi = yi * s
    return (yr[0], yi[0]) if squeeze else (yr, yi)


def fft_exact(input):
    """Host-convenience exact forward DFT (numpy in, (re, im) numpy out)."""
    yr, yi = fft_exact_device(np.asarray(input, dtype=np.float32))
    return np.asarray(yr), np.asarray(yi)


def ifft_exact(input_real, input_imag):
    """Host-convenience exact inverse DFT (numpy in, (re, im) numpy out)."""
    yr, yi = ifft_exact_device(
        np.asarray(input_real, dtype=np.float32),
        np.asarray(input_imag, dtype=np.float32),
    )
    return np.asarray(yr), np.asarray(yi)
