"""DSP convenience ops built on the transforms: convolution and shifts.

Extensions beyond the reference's surface (it ships only PSD + frequency
helpers).  ``fft_convolve`` is the classic FFT-accelerated linear
convolution through this library's pow2 path; the shift helpers mirror
``numpy.fft.fftshift``/``ifftshift`` and are device-capable.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fft_convolve", "fftshift", "ifftshift"]


def fft_convolve(a, b, mode: str = "full"):
    """Linear convolution of two real 1-D signals via the pow2 FFT path.

    ``mode``: "full" (len la+lb-1, default), "same" (len la, centered), or
    "valid" (len la-lb+1, only fully-overlapping samples; requires
    la >= lb).  Matches ``numpy.convolve`` up to f32 rounding.

    >>> fft_convolve([1.0, 2.0, 3.0], [1.0, 1.0]).round(5).tolist()
    [1.0, 3.0, 5.0, 3.0]
    >>> fft_convolve([1.0, 2.0, 3.0], [1.0, 1.0], mode="same").round(5).tolist()
    [1.0, 3.0, 5.0]
    >>> fft_convolve([1.0, 2.0, 3.0], [1.0, 1.0], mode="valid").round(5).tolist()
    [3.0, 5.0]
    """
    import jax.numpy as jnp

    from ..kernels.large import transform_any
    from .transform import next_power_of_two

    av = np.asarray(a, dtype=np.float32)
    bv = np.asarray(b, dtype=np.float32)
    if av.ndim != 1 or bv.ndim != 1 or av.size == 0 or bv.size == 0:
        raise ValueError("fft_convolve expects two non-empty 1-D signals")
    if mode not in ("full", "same", "valid"):
        raise ValueError(f"mode must be full|same|valid, got {mode!r}")
    la, lb = av.shape[0], bv.shape[0]
    if mode == "valid" and la < lb:
        raise ValueError("valid mode requires len(a) >= len(b)")
    lfull = la + lb - 1
    m = next_power_of_two(lfull)
    pa = jnp.asarray(np.pad(av, (0, m - la))[None])
    pb = jnp.asarray(np.pad(bv, (0, m - lb))[None])
    ar, ai = transform_any(pa, None, m, -1)
    br, bi = transform_any(pb, None, m, -1)
    cr = ar * br - ai * bi
    ci = ar * bi + ai * br
    yr, _ = transform_any(cr, ci, m, +1)
    full = np.asarray(yr[0])[:lfull] / np.float32(m)
    if mode == "full":
        return full
    if mode == "same":
        start = (lb - 1) // 2
        return full[start : start + la].copy()
    return full[lb - 1 : la].copy()


def fftshift(x, axes=None):
    """Move the zero-frequency bin to the center (``numpy.fft.fftshift``).

    Device-capable: jax arrays stay on device; other inputs go through
    NumPy.

    >>> fftshift(np.array([0.0, 1.0, 2.0, 3.0])).tolist()
    [2.0, 3.0, 0.0, 1.0]
    """
    import jax

    if isinstance(x, jax.Array):
        import jax.numpy as jnp

        return jnp.fft.fftshift(x, axes=axes)
    return np.fft.fftshift(np.asarray(x), axes=axes)


def ifftshift(x, axes=None):
    """Inverse of :func:`fftshift`.

    >>> ifftshift(fftshift(np.array([0.0, 1.0, 2.0, 3.0, 4.0]))).tolist()
    [0.0, 1.0, 2.0, 3.0, 4.0]
    """
    import jax

    if isinstance(x, jax.Array):
        import jax.numpy as jnp

        return jnp.fft.ifftshift(x, axes=axes)
    return np.fft.ifftshift(np.asarray(x), axes=axes)
