"""Forward/inverse FFT orchestration — the public transform semantics.

API parity with the reference facade (``src/lib.rs:119-232``) and
orchestrators (``src/fft.rs``, ``src/ifft.rs``):

* ``fft(x)``: real f32 signal, zero-padded to the next power of two
  (``src/fft.rs:40-41``); returns split-complex (real, imag) of padded length.
  Length 0/1 edge cases return trivially (``src/fft.rs:44-50``).
* ``ifft(re, im)``: requires equal power-of-two lengths
  (``src/ifft.rs:44-53``); returns ONE array of length 2N laid out
  [real | imag] with 1/N normalization (``src/ifft.rs:140-150``).
* ``fft_batch`` / ``ifft_batch``: all signals padded to the longest signal's
  power of two and processed in a single device pass (``src/fft.rs:165-284``),
  the launch-amortization that gives the reference its 13.5x batch win
  (``README.md:250-262``).

The host API accepts lists/NumPy arrays and returns NumPy arrays (the analog
of the reference's Vec<f32> host buffers).  The ``*_device`` functions are the
jit-composable device-resident path for power users and benchmarks.
"""

from __future__ import annotations

import numpy as np

from ..backends import Backend, resolve_backend
from ..config import MAX_N

__all__ = [
    "fft",
    "ifft",
    "fft_batch",
    "ifft_batch",
    "fft_with",
    "ifft_with",
    "fft_native",
    "ifft_native",
    "rfft",
    "irfft",
    "rfft_device",
    "irfft_device",
    "fft_device",
    "ifft_device",
    "next_power_of_two",
    "warmup",
]


def next_power_of_two(n: int) -> int:
    """Rust ``usize::next_power_of_two`` semantics: 0 -> 1.

    >>> [next_power_of_two(n) for n in (0, 1, 2, 3, 1000, 1024)]
    [1, 1, 2, 4, 1024, 1024]
    """
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def _check_n(n: int) -> None:
    if n > MAX_N:
        raise ValueError(f"transform length {n} exceeds the supported maximum {MAX_N}")


def _dispatch_forward(x2d, backend: Backend):
    """x2d: (B, n) f32 ndarray -> split-complex (re, im) numpy arrays."""
    if backend is Backend.NATIVE:
        from ..backends import native

        return native.forward(x2d)
    import jax.numpy as jnp

    xj = jnp.asarray(x2d, dtype=jnp.float32)
    if backend is Backend.XLA:
        from ..backends import xla

        yr, yi = xla.forward(xj)
    else:
        from ..backends import pallas

        yr, yi = pallas.forward(xj)
    return np.asarray(yr), np.asarray(yi)


def _dispatch_inverse(xr2d, xi2d, backend: Backend):
    if backend is Backend.NATIVE:
        from ..backends import native

        return native.inverse(xr2d, xi2d)
    import jax.numpy as jnp

    xr = jnp.asarray(xr2d, dtype=jnp.float32)
    xi = jnp.asarray(xi2d, dtype=jnp.float32)
    if backend is Backend.XLA:
        from ..backends import xla

        yr, yi = xla.inverse(xr, xi)
    else:
        from ..backends import pallas

        yr, yi = pallas.inverse(xr, xi)
    return np.asarray(yr), np.asarray(yi)


# ── Scalar API ───────────────────────────────────────────────────────────────


def fft(input, backend=None):
    """Forward FFT of a real signal; zero-pads to the next power of two.

    Returns ``(real, imag)`` NumPy arrays, each of length
    ``next_power_of_two(len(input))`` (reference ``src/lib.rs:119-139``).
    """
    x = np.asarray(input, dtype=np.float32)
    if x.ndim != 1:
        raise ValueError(f"fft expects a 1-D signal, got shape {x.shape}")
    n_orig = x.shape[0]
    n = next_power_of_two(n_orig)
    if n <= 1:
        real = np.zeros(n, dtype=np.float32)
        if n == 1 and n_orig == 1:
            real[0] = x[0]
        return real, np.zeros(n, dtype=np.float32)
    _check_n(n)
    padded = np.zeros((1, n), dtype=np.float32)
    padded[0, :n_orig] = x
    yr, yi = _dispatch_forward(padded, resolve_backend(backend))
    return np.asarray(yr[0]), np.asarray(yi[0])


def ifft(input_real, input_imag, backend=None):
    """Inverse FFT of a split-complex spectrum.

    Both inputs must share the same power-of-two length (pass ``fft`` output
    unchanged — reference ``src/ifft.rs:44-53``).  Returns ONE array of length
    2N: ``out[:N]`` is the reconstructed real signal, ``out[N:]`` the
    imaginary part (~0 for real-valued signals).
    """
    xr = np.asarray(input_real, dtype=np.float32)
    xi = np.asarray(input_imag, dtype=np.float32)
    if xr.shape != xi.shape or xr.ndim != 1:
        raise ValueError(
            f"ifft: real and imag must be equal-length 1-D arrays, got {xr.shape} vs {xi.shape}"
        )
    n = xr.shape[0]
    if n == 0 or n & (n - 1):
        raise ValueError(f"ifft: input length {n} is not a power of two (pass fft output)")
    if n <= 1:
        return np.concatenate([xr, xi])
    _check_n(n)
    yr, yi = _dispatch_inverse(xr[None], xi[None], resolve_backend(backend))
    return np.concatenate([np.asarray(yr[0]), np.asarray(yi[0])])


# ── Batch API ────────────────────────────────────────────────────────────────


def fft_batch(signals, backend=None):
    """Forward FFT of a batch of real signals in one device pass.

    All signals are zero-padded to the next power of two of the LONGEST
    signal (reference ``src/fft.rs:170-174``).  Returns one ``(real, imag)``
    pair per signal.  An empty batch returns an empty list.
    """
    if len(signals) == 0:
        return []
    arrays = [np.asarray(s, dtype=np.float32) for s in signals]
    for a in arrays:
        if a.ndim != 1:
            raise ValueError(f"fft_batch expects 1-D signals, got shape {a.shape}")
    max_len = max(a.shape[0] for a in arrays)
    n = max(1, next_power_of_two(max_len))
    if n <= 1:
        out = []
        for a in arrays:
            real = np.zeros(n, dtype=np.float32)
            if n == 1 and a.shape[0] > 0:
                real[0] = a[0]
            out.append((real, np.zeros(n, dtype=np.float32)))
        return out
    _check_n(n)
    batch = np.zeros((len(arrays), n), dtype=np.float32)
    for b, a in enumerate(arrays):
        batch[b, : a.shape[0]] = a
    yr, yi = _dispatch_forward(batch, resolve_backend(backend))
    yr = np.asarray(yr)
    yi = np.asarray(yi)
    return [(yr[b].copy(), yi[b].copy()) for b in range(len(arrays))]


def ifft_batch(signals, backend=None):
    """Inverse FFT of a batch of split-complex spectra in one device pass.

    Each element is a ``(real, imag)`` pair (the direct output of
    ``fft_batch``); all pairs must share the same power-of-two length
    (reference ``src/ifft.rs:181-206``).  Returns one length-2N
    ``[real | imag]`` array per spectrum.
    """
    if len(signals) == 0:
        return []
    res = [np.asarray(r, dtype=np.float32) for r, _ in signals]
    ims = [np.asarray(i, dtype=np.float32) for _, i in signals]
    n = res[0].shape[0]
    for r, i in zip(res, ims):
        if r.ndim != 1 or r.shape != i.shape or r.shape[0] != n:
            raise ValueError("ifft_batch: all (real, imag) pairs must share one 1-D length")
    if n == 0 or n & (n - 1):
        raise ValueError(f"ifft_batch: length {n} is not a power of two (pass fft_batch output)")
    if n <= 1:
        return [np.concatenate([r, i]) for r, i in zip(res, ims)]
    _check_n(n)
    yr, yi = _dispatch_inverse(np.stack(res), np.stack(ims), resolve_backend(backend))
    yr = np.asarray(yr)
    yi = np.asarray(yi)
    return [np.concatenate([yr[b], yi[b]]) for b in range(len(res))]


# ── Backend-explicit entry points (reference ``src/lib.rs:68-98``) ───────────


def warmup(sizes=(1024, 4096, 65536), batches=(1,), inverse: bool = True) -> None:
    """Pre-compile the transform executables for the given (batch, n) shapes.

    jit specializes one executable per input shape (the analog of the
    reference's per-variant shader compile, documented as a warm-up effect at
    ``README.md:87-89``); in serving deployments call this once at startup so
    no request pays the first-compile latency.

    Warms the backend the process will actually use (the resolved default,
    honoring ``GPU_FFT_TPU_BACKEND``); only the host-side NATIVE backend has
    nothing to pre-compile, so that override falls back to warming PALLAS
    instead of raising.
    """
    import jax
    import jax.numpy as jnp

    backend = resolve_backend(None)
    if backend is Backend.NATIVE:
        backend = Backend.PALLAS
    for n in sizes:
        if n < 2 or n & (n - 1):
            raise ValueError(f"warmup sizes must be powers of two >= 2, got {n}")
        for b in batches:
            x = jnp.zeros((b, n), jnp.float32)
            yr, yi = fft_device(x, backend=backend)
            if inverse:
                yr, yi = ifft_device(yr, yi, backend=backend)
            jax.block_until_ready((yr, yi))


# ── One-sided real-input API (numpy.fft.rfft conventions) ────────────────────


def rfft(input, backend=None):
    """One-sided forward FFT of a real signal: the n//2 + 1 unique bins.

    Zero-pads to the next power of two like :func:`fft`, then returns only
    the non-negative-frequency half — ``numpy.fft.rfft`` semantics on the
    padded length.  Extension beyond the reference (which always returns the
    full two-sided spectrum).
    """
    re, im = fft(input, backend=backend)
    h = re.shape[-1] // 2 + 1
    return re[..., :h].copy(), im[..., :h].copy()


def irfft(input_real, input_imag, backend=None):
    """Inverse of :func:`rfft`: reconstruct the real signal from the
    one-sided spectrum (n//2 + 1 bins of a power-of-two n).

    Rebuilds the Hermitian-symmetric full spectrum (X[n-k] = conj(X[k]))
    and runs the inverse transform; returns the length-n real signal.
    """
    xr = np.asarray(input_real, dtype=np.float32)
    xi = np.asarray(input_imag, dtype=np.float32)
    if xr.shape != xi.shape or xr.ndim != 1:
        raise ValueError(
            f"irfft: real and imag must be equal-length 1-D arrays, got {xr.shape} vs {xi.shape}"
        )
    h = xr.shape[0]
    n = 2 * (h - 1)
    if h < 2 or n & (n - 1):
        raise ValueError(
            f"irfft: expected n//2 + 1 bins of a power-of-two n, got {h} bins"
        )
    full_r = np.concatenate([xr, xr[1:-1][::-1]])
    full_i = np.concatenate([xi, -xi[1:-1][::-1]])
    # Hermitian endpoints: DC and Nyquist bins of a real signal are real.
    full_i[0] = 0.0
    full_i[h - 1] = 0.0
    out = ifft(full_r, full_i, backend=backend)
    return out[:n]


def rfft_device(x, backend=None):
    """Device-resident one-sided forward FFT of real rows.

    ``x``: (n,) or (B, n) f32 with power-of-two n.  Returns split-complex
    arrays of the n//2 + 1 unique bins, staying on device.
    """
    yr, yi = fft_device(x, backend=backend)
    h = yr.shape[-1] // 2 + 1
    return yr[..., :h], yi[..., :h]


def irfft_device(xr, xi, backend=None):
    """Device-resident inverse of :func:`rfft_device`: real rows back.

    ``xr, xi``: (h,) or (B, h) with h = n//2 + 1 bins of a power-of-two n.
    Returns the length-n real signal(s) (the residual imaginary part of a
    Hermitian spectrum is identically zero and is dropped).
    """
    import jax.numpy as jnp

    xr = jnp.asarray(xr, dtype=jnp.float32)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    if xr.shape != xi.shape:
        raise ValueError(f"irfft_device: shapes differ: {xr.shape} vs {xi.shape}")
    h = xr.shape[-1]
    n = 2 * (h - 1)
    if h < 2 or n & (n - 1):
        raise ValueError(
            f"irfft_device: expected n//2 + 1 bins of a power-of-two n, got {h} bins"
        )
    resolved = resolve_backend(backend)
    if resolved is Backend.PALLAS:
        # Default device path: real-output inverse straight from the
        # one-sided bins (kernels/large.py:inverse_real_half) — at direct
        # sizes the Hermitian symmetry folds into the DFT tables (two real
        # dots contracting h, zero mirror); at fold sizes the dispatch
        # reads only the k1 <= n1/2 grid columns so XLA dead-code-
        # eliminates most of the internal Hermitian reconstruction.
        from ..kernels.large import inverse_real_half

        squeeze = xr.ndim == 1
        rr = xr[None] if squeeze else xr
        ri = xi[None] if squeeze else xi
        yr = inverse_real_half(rr, ri, n, scale=1.0 / n)
        return yr[0] if squeeze else yr
    # Hermitian reconstruction: X[n-k] = conj(X[k]); DC/Nyquist forced real.
    xi = xi.at[..., 0].set(0.0).at[..., h - 1].set(0.0)
    full_r = jnp.concatenate([xr, jnp.flip(xr[..., 1:-1], axis=-1)], axis=-1)
    full_i = jnp.concatenate([xi, -jnp.flip(xi[..., 1:-1], axis=-1)], axis=-1)
    yr, _ = ifft_device(full_r, full_i, backend=backend)
    return yr


def fft_with(input, backend):
    """Forward FFT via an explicit backend (reference ``fft_with``)."""
    return fft(input, backend=backend)


def ifft_with(input_real, input_imag, backend):
    """Inverse FFT via an explicit backend (reference ``ifft_with``)."""
    return ifft(input_real, input_imag, backend=backend)


def fft_native(input):
    """Forward FFT on the native C++ backend directly — the analog of the
    reference's ``fft_mlx`` direct-entry alias (``src/lib.rs:221-226``)."""
    return fft(input, backend=Backend.NATIVE)


def ifft_native(input_real, input_imag):
    """Inverse FFT on the native C++ backend directly (``src/lib.rs:228-232``)."""
    return ifft(input_real, input_imag, backend=Backend.NATIVE)


# ── Device-resident API (jit-composable; for pipelines and benchmarks) ───────


def fft_device(x, backend=None):
    """Forward FFT of a device array (rows = signals), staying on device.

    ``x``: (n,) or (B, n) f32 with power-of-two n.  Returns jax arrays.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    n = x.shape[-1]
    if n & (n - 1) or n < 2:
        raise ValueError(f"fft_device requires power-of-two n >= 2, got {n}")
    _check_n(n)
    backend = resolve_backend(backend)
    if backend is Backend.NATIVE:
        raise ValueError("the NATIVE backend is host-side; use fft() / fft_batch()")
    if backend is Backend.XLA:
        from ..backends import xla

        yr, yi = xla.forward(x)
    else:
        from ..backends import pallas

        yr, yi = pallas.forward(x)
    return (yr[0], yi[0]) if squeeze else (yr, yi)


def ifft_device(xr, xi, backend=None):
    """Inverse FFT of device arrays, staying on device. Returns (real, imag)."""
    import jax.numpy as jnp

    xr = jnp.asarray(xr, dtype=jnp.float32)
    xi = jnp.asarray(xi, dtype=jnp.float32)
    if xr.shape != xi.shape:
        raise ValueError(
            f"ifft_device: real and imag must have the same shape, got {xr.shape} vs {xi.shape}"
        )
    squeeze = xr.ndim == 1
    if squeeze:
        xr, xi = xr[None], xi[None]
    n = xr.shape[-1]
    if n & (n - 1) or n < 2:
        raise ValueError(f"ifft_device requires power-of-two n >= 2, got {n}")
    _check_n(n)
    backend = resolve_backend(backend)
    if backend is Backend.NATIVE:
        raise ValueError("the NATIVE backend is host-side; use ifft() / ifft_batch()")
    if backend is Backend.XLA:
        from ..backends import xla

        yr, yi = xla.inverse(xr, xi)
    else:
        from ..backends import pallas

        yr, yi = pallas.inverse(xr, xi)
    return (yr[0], yi[0]) if squeeze else (yr, yi)
