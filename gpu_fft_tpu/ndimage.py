"""``scipy.ndimage`` drop-in namespace: the Fourier-domain filter family.

The rest of scipy.ndimage is spatial-domain image processing outside this
library's scope; the four fourier_* filters are spectral multipliers that
ride the same table-generation discipline as every transform here (f64
host tables, fused f32 device multiplies).  See ops/ndimage_fourier.py.

Usage (scipy signatures)::

    import gpu_fft_tpu.ndimage as ndi
    import gpu_fft_tpu.compat as fft
    blurred = fft.ifft2(ndi.fourier_gaussian(fft.fft2(img), sigma=4)).real
"""

from .ops.ndimage_fourier import (  # noqa: F401
    fourier_ellipsoid,
    fourier_ellipsoid_device,
    fourier_gaussian,
    fourier_gaussian_device,
    fourier_shift,
    fourier_shift_device,
    fourier_uniform,
    fourier_uniform_device,
)

__all__ = [
    "fourier_gaussian",
    "fourier_uniform",
    "fourier_ellipsoid",
    "fourier_shift",
    "fourier_gaussian_device",
    "fourier_uniform_device",
    "fourier_ellipsoid_device",
    "fourier_shift_device",
]
