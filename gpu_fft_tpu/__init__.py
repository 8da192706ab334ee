"""gpu_fft_tpu — a TPU-native FFT library built from scratch on JAX/Pallas.

Re-creates the full capability surface of the reference GPU library
(eugenehp/gpu-fft: ``src/lib.rs``): forward/inverse FFT of real f32 signals
with automatic next-power-of-two zero padding, single-pass batched transforms,
PSD and dominant-frequency analysis, and runtime backend selection — designed
TPU-first: transforms are MXU matmuls against precomputed f64-accurate tables
fused into single Pallas kernels, not translated butterfly stages.

Public facade (parity map to reference ``src/lib.rs``):
  fft / ifft                     <- lib.rs:137 / lib.rs:191
  fft_batch / ifft_batch         <- lib.rs:163 / lib.rs:214
  fft_with / ifft_with           <- lib.rs:73  / lib.rs:89
  Backend / available_backends   <- lib.rs:33  / lib.rs:57
  psd                            <- psd.rs:28
  utils.*                        <- utils.rs
  fft_device / ifft_device / power_spectrum_device — device-resident extras
  parallel.*                     — multi-chip sharding (TPU extension, SURVEY §2.4)
"""

from .backends import Backend, available_backends, default_backend
from .ops.dct import (
    dct,
    dct_device,
    dst,
    dst_device,
    idct,
    idct_device,
    idst,
    idst_device,
)
from .ops.czt import czt, czt_device, zoom_fft, zoom_fft_device
from .ops.dsp import (
    envelope,
    fft_convolve,
    fft_convolve_device,
    fft_correlate,
    fftshift,
    hilbert,
    hilbert_device,
    ifftshift,
    resample,
    resample_device,
)
from .ops.exact import fft_exact, fft_exact_device, ifft_exact, ifft_exact_device
from .ops.filter import (
    FIRStream,
    fft_convolve2d,
    fft_convolve2d_device,
    fft_correlate2d,
    fftfilt,
    fftfilt_device,
    filtfilt_fir,
    firwin,
    firwin2,
    freqz_fir,
    kaiser_atten,
    kaiser_beta,
    kaiserord,
    minimum_phase,
    oaconvolve,
    oaconvolve_device,
)
from .ops.multirate import (
    decimate,
    resample_poly,
    resample_poly_device,
    upfirdn,
    upfirdn_device,
)
from .ops.fft2d import (
    fft2,
    fft2_device,
    fftn,
    fftn_device,
    ifft2,
    ifft2_device,
    ifftn,
    irfft2,
    irfft2_device,
    rfft2,
    rfft2_device,
)
from .ops.spectral import (
    coherence,
    coherence_device,
    csd,
    csd_device,
    periodogram,
    periodogram_device,
    power_spectrum_device,
    psd,
    psd_device,
    spectrogram,
    spectrogram_device,
    spectrogram_scipy,
    welch,
    welch_device,
)
from .ops.stft import istft, istft_device, stft, stft_device, window_table
from .ops.transform import (
    fft,
    fft_batch,
    fft_device,
    fft_native,
    fft_with,
    ifft,
    ifft_batch,
    ifft_device,
    ifft_native,
    ifft_with,
    irfft,
    irfft_device,
    next_power_of_two,
    rfft,
    rfft_device,
    warmup,
)
from .plan import describe_plan
from . import utils

__version__ = "0.6.0"

__all__ = [
    "fft",
    "ifft",
    "fft_batch",
    "ifft_batch",
    "fft_with",
    "ifft_with",
    "fft_native",
    "ifft_native",
    "fft_device",
    "ifft_device",
    "fft2",
    "ifft2",
    "fft2_device",
    "ifft2_device",
    "fftn",
    "ifftn",
    "fftn_device",
    "rfft2",
    "irfft2",
    "rfft2_device",
    "irfft2_device",
    "fft_exact",
    "ifft_exact",
    "fft_exact_device",
    "ifft_exact_device",
    "czt",
    "czt_device",
    "zoom_fft",
    "zoom_fft_device",
    "rfft",
    "irfft",
    "rfft_device",
    "irfft_device",
    "fft_convolve",
    "fft_convolve_device",
    "fft_correlate",
    "oaconvolve",
    "oaconvolve_device",
    "firwin",
    "firwin2",
    "fftfilt",
    "fftfilt_device",
    "filtfilt_fir",
    "freqz_fir",
    "fft_convolve2d",
    "fft_convolve2d_device",
    "fft_correlate2d",
    "kaiserord",
    "kaiser_beta",
    "kaiser_atten",
    "FIRStream",
    "minimum_phase",
    "fftshift",
    "ifftshift",
    "hilbert",
    "hilbert_device",
    "envelope",
    "resample",
    "resample_device",
    "upfirdn",
    "upfirdn_device",
    "resample_poly",
    "resample_poly_device",
    "decimate",
    "dct",
    "idct",
    "dst",
    "idst",
    "dct_device",
    "idct_device",
    "dst_device",
    "idst_device",
    "stft",
    "istft",
    "stft_device",
    "istft_device",
    "window_table",
    "welch",
    "welch_device",
    "csd",
    "csd_device",
    "coherence",
    "coherence_device",
    "periodogram",
    "periodogram_device",
    "next_power_of_two",
    "warmup",
    "psd",
    "psd_device",
    "power_spectrum_device",
    "spectrogram",
    "spectrogram_device",
    "spectrogram_scipy",
    "describe_plan",
    "Backend",
    "available_backends",
    "default_backend",
    "utils",
    "__version__",
]
