"""Exact arbitrary-length FFT via Bluestein's chirp-z algorithm.

The reference (and this library's ``fft``) zero-pads non-power-of-two
signals to the next power of two — which computes a DIFFERENT spectrum
(padded-length bins).  ``fft_exact`` computes the true length-n DFT for ANY
n >= 1 by re-expressing it as a circular convolution of power-of-two size,
which then runs through this library's measured pow2 path:

    X[k] = w*[k] . sum_j (x[j] w*[j]) . w[(k-j)]   with w[j] = e^{i pi j^2 / n}

realized as:  a = x * conj(w);  X = conj(w) * IFFT_m(FFT_m(a) * B)
where m = next_pow2(2n - 1) and B = FFT_m of the circularly-wrapped chirp.

Accuracy: the chirp exponents j^2 are reduced mod 2n in exact int64 before
the f64 exponential (j^2 overflows f64's integer range long before n's
limit), so table error stays at 1/2 ulp; end-to-end error is a few f32 ulps
times log(m), comfortably inside the 5*log2(m)*eps-style gates.

This is an extension beyond reference parity — the reference has no exact
non-pow2 path at all.
"""

from __future__ import annotations

import functools

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
