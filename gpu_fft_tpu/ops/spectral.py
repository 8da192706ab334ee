"""Power-spectral-density and fused spectral pipelines.

``psd`` matches the reference op exactly: per-bin power (re^2 + im^2) / n
(reference ``src/psd.rs:28-36``), with the one-sided slicing convention left
to the caller (``src/psd.rs:5-7``).  ``power_spectrum_device`` is the fused
fft->psd follow-on the north star calls for: the whole pipeline stays on
device inside one jitted program so the PSD math fuses into the transform's
epilogue instead of costing an extra HBM pass.
"""

from __future__ import annotations

import numpy as np

from .transform import fft_device

__all__ = ["psd", "psd_device", "power_spectrum_device", "one_sided_bins"]


def psd(real, imag):
    """Power Spectral Density: (real^2 + imag^2) / n per bin (``src/psd.rs:28``)."""
    r = np.asarray(real, dtype=np.float32)
    i = np.asarray(imag, dtype=np.float32)
    if r.shape != i.shape:
        raise ValueError(f"psd: real and imag must have the same shape, got {r.shape} vs {i.shape}")
    n = np.float32(r.shape[-1])
    return (r * r + i * i) / n


def psd_device(real, imag):
    """Device-resident PSD over the last axis (jit-composable)."""
    import jax.numpy as jnp

    r = jnp.asarray(real, dtype=jnp.float32)
    i = jnp.asarray(imag, dtype=jnp.float32)
    return (r * r + i * i) * jnp.float32(1.0 / r.shape[-1])


def one_sided_bins(n: int) -> int:
    """Number of unique bins of a real-signal spectrum: n // 2 + 1."""
    return n // 2 + 1


def power_spectrum_device(x, backend=None, one_sided: bool = True):
    """Fused fft -> PSD pipeline on device.

    ``x``: (n,) or (B, n) real f32, power-of-two n.  Returns the (optionally
    one-sided) PSD.  This is the fused analog of the reference's
    fft-then-psd CPU sequence in ``examples/simple.rs:26-37``.
    """
    yr, yi = fft_device(x, backend=backend)
    p = psd_device(yr, yi)
    if one_sided:
        n = p.shape[-1]
        p = p[..., : one_sided_bins(n)]
    return p
