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

__all__ = [
    "psd",
    "psd_device",
    "power_spectrum_device",
    "one_sided_bins",
    "spectrogram",
    "spectrogram_device",
    "spectrogram_scipy",
    "welch",
    "welch_device",
    "csd",
    "csd_device",
    "coherence",
    "coherence_device",
    "periodogram",
    "periodogram_device",
    "lombscargle",
]


def psd(real, imag):
    """Power Spectral Density: (real^2 + imag^2) / n per bin (``src/psd.rs:28``).

    Doc-example (run by the test suite, like the reference's doc-test at
    ``src/psd.rs:19-26``):

    >>> psd([3.0, 0.0, 4.0, 0.0], [4.0, 0.0, 3.0, 0.0]).tolist()
    [6.25, 0.0, 6.25, 0.0]
    >>> psd([2.0, 0.0], [0.0, 2.0]).tolist()
    [2.0, 2.0]
    """
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


def spectrogram_device(
    x,
    frame_size: int,
    hop: int | None = None,
    one_sided: bool = True,
    window: str | None = None,
):
    """STFT-magnitude spectrogram via the single-pass batch transform.

    An extension beyond the reference's API: frames a 1-D signal into
    overlapping windows and runs ONE batched device FFT over all frames —
    the batch-amortization pattern (reference ``src/fft.rs:191-205``) applied
    to streaming spectral analysis.

    ``x``: (n_samples,) real f32; ``frame_size``: power of two; ``hop``
    defaults to frame_size (non-overlapping); ``window``: None
    (rectangular), "hann", "hamming", or "blackman" to trade main-lobe
    width against sidelobe leakage.  Returns a (num_frames, bins) PSD
    array; frames that would run past the end of the signal are dropped.
    """
    import jax.numpy as jnp

    if frame_size < 2 or frame_size & (frame_size - 1):
        raise ValueError(f"frame_size must be a power of two >= 2, got {frame_size}")
    hop = frame_size if hop is None else hop
    if hop < 1:
        raise ValueError(f"hop must be >= 1, got {hop}")
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim != 1:
        raise ValueError(f"spectrogram expects a 1-D signal, got shape {x.shape}")
    n = x.shape[0]
    num_frames = (n - frame_size) // hop + 1
    if num_frames < 1:
        raise ValueError(f"signal of {n} samples is shorter than one {frame_size} frame")
    from .stft import frame_signal

    frames = frame_signal(x, frame_size, hop, num_frames)
    if window is not None:
        from .stft import window_table

        frames = frames * window_table(window, frame_size)[None]
    return power_spectrum_device(frames, one_sided=one_sided)


def spectrogram(
    x,
    frame_size: int,
    hop: int | None = None,
    one_sided: bool = True,
    window: str | None = None,
):
    """Host-convenience spectrogram; see :func:`spectrogram_device`."""
    return np.asarray(
        spectrogram_device(np.asarray(x, dtype=np.float32), frame_size, hop, one_sided, window)
    )


def spectrogram_scipy(
    x,
    fs: float = 1.0,
    window=("tukey", 0.25),
    nperseg: int = 256,
    noverlap: int | None = None,
    nfft: int | None = None,
    detrend: bool | str = "constant",
    scaling: str = "density",
    mode: str = "psd",
):
    """Drop-in ``scipy.signal.spectrogram``: returns ``(f, t, Sxx)``.

    The per-segment counterpart of :func:`welch` (same segmentation,
    windowing, detrend, and scaling — welch is this averaged over ``t``),
    with scipy's conventions: default tukey(0.25) window, ``noverlap``
    defaults to nperseg // 8, segment times at the window centers.
    ``mode``: "psd" (default; Sxx shape (bins, num_seg)), "magnitude"
    (|STFT| scaled by the square root of the PSD scale, scipy's stft
    scaling, no one-sided doubling), or "complex" (returns split-complex
    ``(Sr, Si)`` as Sxx).  All segments ride one batched device transform;
    Sxx is returned as NumPy.
    """
    if mode not in ("psd", "magnitude", "complex"):
        raise ValueError(f"mode must be psd|magnitude|complex, got {mode!r}")
    noverlap = nperseg // 8 if noverlap is None else noverlap
    xv = np.asarray(x, dtype=np.float32)
    yr, yi = _segment_spectra(
        xv, nperseg, noverlap, window, detrend, fs, scaling, "spectrogram", nfft
    )
    nbins = nperseg if nfft is None else nfft
    hop = nperseg - noverlap
    num_seg = yr.shape[-2]
    freqs = np.arange(nbins // 2 + 1, dtype=np.float64) * (fs / nbins)
    times = (nperseg / 2.0 + hop * np.arange(num_seg)) / fs
    yr, yi = np.asarray(yr), np.asarray(yi)
    if mode == "psd":
        sxx = (yr * yr + yi * yi) * _welch_scale_mult(window, nperseg, fs, scaling, nfft)
        return freqs, times, np.moveaxis(sxx, -2, -1)  # (..., bins, num_seg)
    from .stft import window_table

    w64 = window_table(window, nperseg).astype(np.float64)
    if scaling == "density":
        s = np.float32(np.sqrt(1.0 / (fs * np.sum(w64 * w64))))
    else:
        s = np.float32(1.0 / np.sum(w64))
    if mode == "magnitude":
        return freqs, times, np.moveaxis(np.hypot(yr, yi) * s, -2, -1)
    return freqs, times, (np.moveaxis(yr * s, -2, -1), np.moveaxis(yi * s, -2, -1))


def _detrend_rows(rows, mode):
    """Per-row detrend: False/None off; True/'constant' removes the mean;
    'linear' removes the least-squares line (``scipy.signal.detrend``)."""
    import jax.numpy as jnp

    if mode is False or mode is None:
        return rows
    if mode is True or mode == "constant":
        return rows - jnp.mean(rows, axis=-1, keepdims=True)
    if mode == "linear":
        n = rows.shape[-1]
        tc = np.arange(n) - (n - 1) / 2.0  # centered time axis: zero-mean
        t = jnp.asarray(tc.astype(np.float32))
        denom = jnp.float32(float(np.sum(tc * tc)))
        mean = jnp.mean(rows, axis=-1, keepdims=True)
        slope = jnp.sum(rows * t, axis=-1, keepdims=True) / denom
        return rows - mean - slope * t
    raise ValueError(f"detrend must be False, 'constant', or 'linear', got {mode!r}")


def _welch_scale_mult(
    window, nperseg: int, fs: float, scaling: str, nfft: int | None = None
) -> np.ndarray:
    """One-sided per-bin scale for Welch-family estimators (scipy semantics):
    window normalization x interior-bin doubling.  ``nfft`` >= nperseg pads
    segments (finer bin grid); the window sums are unchanged."""
    from .stft import window_table

    nfft = nperseg if nfft is None else nfft
    w64 = window_table(window, nperseg).astype(np.float64)
    if scaling == "density":
        scale = 1.0 / (fs * float(np.sum(w64 * w64)))
    else:
        scale = 1.0 / float(np.sum(w64)) ** 2
    h = nfft // 2 + 1
    mult = np.full(h, 2.0 * scale, dtype=np.float32)
    mult[0] = scale
    if nfft % 2 == 0:
        mult[-1] = scale
    return mult


def _segment_spectra(
    x,
    nperseg: int,
    noverlap: int | None,
    window: str | None,
    detrend: bool | str,
    fs: float,
    scaling: str,
    name: str,
    nfft: int | None = None,
    ordered: bool = True,
):
    """Shared Welch-family front end: validate, segment, detrend, window,
    and run ONE batched one-sided transform.  Returns split-complex
    (num_seg, bins) device arrays.  ``detrend``: False/None (off),
    True/'constant' (subtract the per-segment mean), or 'linear'
    (subtract the per-segment least-squares line, scipy semantics).
    ``ordered=False`` lets reduction-only consumers (welch/csd/coherence)
    take the cheap residue-grouped framing (frame_signal_unordered) —
    spectrogram/stft need time order and keep the default."""
    import jax.numpy as jnp

    from .stft import frame_signal, frame_signal_unordered, window_table
    from .transform import rfft_device

    if scaling not in ("density", "spectrum"):
        raise ValueError(f"scaling must be 'density' or 'spectrum', got {scaling!r}")
    if nperseg < 2 or nperseg & (nperseg - 1):
        raise ValueError(f"nperseg must be a power of two >= 2, got {nperseg}")
    nfft = nperseg if nfft is None else nfft
    if nfft < nperseg or nfft & (nfft - 1):
        raise ValueError(f"nfft must be a power of two >= nperseg, got {nfft}")
    noverlap = nperseg // 2 if noverlap is None else noverlap
    if not 0 <= noverlap < nperseg:
        raise ValueError(f"noverlap must be in [0, nperseg), got {noverlap}")
    if fs <= 0:
        raise ValueError(f"fs must be positive, got {fs}")
    hop = nperseg - noverlap
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim not in (1, 2):
        raise ValueError(f"{name} expects a 1-D signal or (channels, n), got shape {x.shape}")
    n = x.shape[-1]
    num_seg = (n - nperseg) // hop + 1
    if num_seg < 1:
        raise ValueError(f"signal of {n} samples is shorter than one {nperseg} segment")
    framer = frame_signal if ordered else frame_signal_unordered
    if x.ndim == 2:  # multi-channel: all channels ride one batched transform
        import jax

        c = x.shape[0]
        segs = jax.vmap(lambda row: framer(row, nperseg, hop, num_seg))(x)
        segs = segs.reshape(c * num_seg, nperseg)
    else:
        segs = framer(x, nperseg, hop, num_seg)
    segs = _detrend_rows(segs, detrend)
    segs = segs * window_table(window, nperseg)[None]
    if nfft > nperseg:  # finer bin grid: zero-pad the windowed segments
        segs = jnp.pad(segs, ((0, 0), (0, nfft - nperseg)))
    yr, yi = rfft_device(segs)
    if x.ndim == 2:
        h = nfft // 2 + 1
        return yr.reshape(c, num_seg, h), yi.reshape(c, num_seg, h)
    return yr, yi


def _median_bias(n: int) -> float:
    """Bias of the median of ``n`` iid exponential periodogram values
    relative to their mean (the scipy.signal correction factor)."""
    ii2 = 2.0 * np.arange(1.0, (n - 1) // 2 + 1)
    return float(1.0 + np.sum(1.0 / (ii2 + 1.0) - 1.0 / ii2))


def welch_device(
    x,
    fs: float = 1.0,
    window: str | None = "hann",
    nperseg: int = 256,
    noverlap: int | None = None,
    detrend: bool | str = True,
    scaling: str = "density",
    average: str = "mean",
    nfft: int | None = None,
):
    """Welch averaged-periodogram PSD estimate (device, jit-composable).

    Splits ``x`` into overlapping ``nperseg``-sample segments (power of two;
    ``noverlap`` defaults to nperseg // 2), optionally removes each segment's
    mean (``detrend``, scipy's "constant"), windows them, runs ONE batched
    one-sided transform over all segments, and averages the per-bin power.
    Interior bins are doubled (one-sided convention).  ``scaling``:
    "density" (V**2/Hz, normalized by fs * sum(w**2)) or "spectrum" (V**2,
    normalized by sum(w)**2) — ``scipy.signal.welch`` semantics, which this
    matches to f32 rounding for periodic windows.

    Returns ``(freqs, psd)``: freqs is a host NumPy array of the
    nperseg // 2 + 1 bin frequencies; psd stays on device.  A 2-D
    ``(channels, n)`` input yields a ``(channels, bins)`` psd (per-row
    estimates, ``scipy.signal.welch`` axis=-1 semantics), all channels in
    one batched transform.  ``average``: "mean" (default) or "median" —
    the bias-corrected per-bin median over segments, robust to transient
    spikes (``scipy.signal.welch`` semantics).
    """
    import jax.numpy as jnp

    if average not in ("mean", "median"):
        raise ValueError(f"average must be 'mean' or 'median', got {average!r}")
    yr, yi = _segment_spectra(
        x, nperseg, noverlap, window, detrend, fs, scaling, "welch", nfft, ordered=False
    )
    nbins = nperseg if nfft is None else nfft
    seg_power = yr * yr + yi * yi  # (..., num_seg, bins)
    if average == "median":
        power = jnp.median(seg_power, axis=-2) / jnp.float32(
            _median_bias(seg_power.shape[-2])
        )
    else:
        power = jnp.mean(seg_power, axis=-2)  # (bins,) or (channels, bins)
    freqs = np.arange(nbins // 2 + 1, dtype=np.float64) * (fs / nbins)
    return freqs, power * _welch_scale_mult(window, nperseg, fs, scaling, nfft)


def welch(
    x,
    fs: float = 1.0,
    window: str | None = "hann",
    nperseg: int = 256,
    noverlap: int | None = None,
    detrend: bool | str = True,
    scaling: str = "density",
    average: str = "mean",
    nfft: int | None = None,
):
    """Host-convenience Welch PSD; see :func:`welch_device`.

    Returns ``(freqs, psd)`` as NumPy arrays.
    """
    freqs, p = welch_device(
        np.asarray(x, dtype=np.float32), fs, window, nperseg, noverlap, detrend,
        scaling, average, nfft,
    )
    return freqs, np.asarray(p)


def csd_device(
    x,
    y,
    fs: float = 1.0,
    window: str | None = "hann",
    nperseg: int = 256,
    noverlap: int | None = None,
    detrend: bool | str = True,
    scaling: str = "density",
    nfft: int | None = None,
):
    """Cross spectral density Pxy by Welch's method (device).

    ``scipy.signal.csd`` semantics: Pxy = mean over segments of
    conj(X) * Y with the same windowing/scaling as :func:`welch_device`
    (welch(x) == csd(x, x) exactly).  Returns ``(freqs, (pxy_re, pxy_im))``
    — split-complex, since Pxy is complex for distinct signals.
    """
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.float32)
    y = jnp.asarray(y, dtype=jnp.float32)
    if x.shape != y.shape:
        raise ValueError(f"csd: signals must share one shape, got {x.shape} vs {y.shape}")
    xr, xi = _segment_spectra(
        x, nperseg, noverlap, window, detrend, fs, scaling, "csd", nfft, ordered=False
    )
    yr, yi = _segment_spectra(
        y, nperseg, noverlap, window, detrend, fs, scaling, "csd", nfft, ordered=False
    )
    nbins = nperseg if nfft is None else nfft
    # conj(X) * Y
    pr = jnp.mean(xr * yr + xi * yi, axis=-2)
    pi = jnp.mean(xr * yi - xi * yr, axis=-2)
    mult = _welch_scale_mult(window, nperseg, fs, scaling, nfft)
    freqs = np.arange(nbins // 2 + 1, dtype=np.float64) * (fs / nbins)
    return freqs, (pr * mult, pi * mult)


def csd(
    x,
    y,
    fs: float = 1.0,
    window: str | None = "hann",
    nperseg: int = 256,
    noverlap: int | None = None,
    detrend: bool | str = True,
    scaling: str = "density",
    nfft: int | None = None,
):
    """Host-convenience cross spectral density; see :func:`csd_device`."""
    freqs, (pr, pi) = csd_device(
        np.asarray(x, dtype=np.float32),
        np.asarray(y, dtype=np.float32),
        fs,
        window,
        nperseg,
        noverlap,
        detrend,
        scaling,
        nfft,
    )
    return freqs, (np.asarray(pr), np.asarray(pi))


def coherence_device(
    x,
    y,
    fs: float = 1.0,
    window: str | None = "hann",
    nperseg: int = 256,
    noverlap: int | None = None,
):
    """Magnitude-squared coherence Cxy = |Pxy|**2 / (Pxx * Pyy) (device).

    ``scipy.signal.coherence`` semantics; Cxy in [0, 1] measures the linear
    dependence of ``y`` on ``x`` per frequency bin.  One segmentation pass
    per signal feeds all three Welch estimates (the scaling cancels, so none
    is applied).
    """
    import jax.numpy as jnp

    x = jnp.asarray(x, dtype=jnp.float32)
    y = jnp.asarray(y, dtype=jnp.float32)
    if x.shape != y.shape:
        raise ValueError(f"coherence: signals must share one shape, got {x.shape} vs {y.shape}")
    xr, xi = _segment_spectra(
        x, nperseg, noverlap, window, True, fs, "density", "coherence", ordered=False
    )
    yr, yi = _segment_spectra(
        y, nperseg, noverlap, window, True, fs, "density", "coherence", ordered=False
    )
    pxx = jnp.mean(xr * xr + xi * xi, axis=-2)
    pyy = jnp.mean(yr * yr + yi * yi, axis=-2)
    pr = jnp.mean(xr * yr + xi * yi, axis=-2)
    pi = jnp.mean(xr * yi - xi * yr, axis=-2)
    den = pxx * pyy
    cxy = jnp.where(den > 0, (pr * pr + pi * pi) / jnp.where(den > 0, den, 1.0), 0.0)
    freqs = np.arange(nperseg // 2 + 1, dtype=np.float64) * (fs / nperseg)
    return freqs, cxy


def coherence(
    x,
    y,
    fs: float = 1.0,
    window: str | None = "hann",
    nperseg: int = 256,
    noverlap: int | None = None,
):
    """Host-convenience magnitude-squared coherence; see :func:`coherence_device`."""
    freqs, c = coherence_device(
        np.asarray(x, dtype=np.float32), np.asarray(y, dtype=np.float32), fs, window, nperseg, noverlap
    )
    return freqs, np.asarray(c)


def periodogram_device(
    x,
    fs: float = 1.0,
    window: str | None = None,
    detrend: bool | str = True,
    scaling: str = "density",
):
    """Single-segment one-sided periodogram of the WHOLE signal (device).

    ``scipy.signal.periodogram`` semantics (default boxcar window, constant
    detrend): one exact length-n transform — any n, non-pow2 runs through
    the Bluestein path — then per-bin power with the same window/one-sided
    scaling as :func:`welch_device`.  Returns ``(freqs, psd)``.
    """
    import jax.numpy as jnp

    from .exact import fft_exact_device
    from .stft import window_table

    if scaling not in ("density", "spectrum"):
        raise ValueError(f"scaling must be 'density' or 'spectrum', got {scaling!r}")
    if fs <= 0:
        raise ValueError(f"fs must be positive, got {fs}")
    x = jnp.asarray(x, dtype=jnp.float32)
    if x.ndim != 1 or x.shape[0] < 2:
        raise ValueError(f"periodogram expects a 1-D signal of >= 2 samples, got {x.shape}")
    n = x.shape[0]
    x = _detrend_rows(x[None], detrend)[0]
    w = window_table(window, n)
    yr, yi = fft_exact_device(x * w)
    h = n // 2 + 1
    power = yr[:h] ** 2 + yi[:h] ** 2
    w64 = w.astype(np.float64)
    if scaling == "density":
        scale = 1.0 / (fs * float(np.sum(w64 * w64)))
    else:
        scale = 1.0 / float(np.sum(w64)) ** 2
    mult = np.full(h, 2.0 * scale, dtype=np.float32)
    mult[0] = scale
    if n % 2 == 0:
        mult[-1] = scale
    freqs = np.arange(h, dtype=np.float64) * (fs / n)
    return freqs, power * mult


def periodogram(
    x,
    fs: float = 1.0,
    window: str | None = None,
    detrend: bool | str = True,
    scaling: str = "density",
):
    """Host-convenience periodogram; see :func:`periodogram_device`."""
    freqs, p = periodogram_device(np.asarray(x, dtype=np.float32), fs, window, detrend, scaling)
    return freqs, np.asarray(p)


def lombscargle(x, y, freqs, precenter: bool = False, normalize: bool = False):
    """Lomb-Scargle periodogram of UNEVENLY sampled data
    (``scipy.signal.lombscargle`` semantics, the classic bool interface).

    ``x``: sample times, ``y``: values, ``freqs``: angular frequencies.
    Uses the Townsend tau-rotated form (the one scipy implements), f64,
    chunked over frequencies to bound the (M, N) working set.

    Host-side by design, like the utils layer: the trig arguments are the
    raw products ``w*t`` (magnitude up to w_max * t_max), and reducing
    them mod 2*pi in f32 costs ~|w*t| * 2^-24 radians of phase — at
    typical ranges that is 1e-2+ rad, far past the parity tolerance, so
    the honest implementations are f64 host or a compensated-arithmetic
    kernel; the measured device pipeline here serves the EVENLY sampled
    case (periodogram/welch).
    """
    x = np.asarray(x, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    freqs = np.asarray(freqs, dtype=np.float64).ravel()
    if x.shape != y.shape:
        raise ValueError(f"x and y must have the same length, got {x.shape} vs {y.shape}")
    if x.size == 0 or freqs.size == 0:
        raise ValueError("lombscargle expects non-empty x and freqs")
    if np.any(freqs == 0.0):
        raise ZeroDivisionError("freqs must be nonzero")
    if precenter:
        y = y - y.mean()
    p = np.empty(freqs.shape[0], dtype=np.float64)
    # ~32 MB working set per chunk at f64.
    chunk = max(1, int(4e6 // max(x.size, 1)))
    for s in range(0, freqs.shape[0], chunk):
        w = freqs[s : s + chunk][:, None]
        wt = w * x[None, :]
        c, sn = np.cos(wt), np.sin(wt)
        xc = c @ y
        xs = sn @ y
        cc = np.einsum("ij,ij->i", c, c)
        ss = x.size - cc
        cs = np.einsum("ij,ij->i", c, sn)
        tau = 0.5 * np.arctan2(2.0 * cs, cc - ss)
        ct, st = np.cos(tau), np.sin(tau)
        ycos = xc * ct + xs * st
        ysin = xs * ct - xc * st
        cc_t = cc * ct * ct + 2.0 * cs * st * ct + ss * st * st
        ss_t = ss * ct * ct - 2.0 * cs * st * ct + cc * st * st
        p[s : s + chunk] = 0.5 * (ycos * ycos / cc_t + ysin * ysin / ss_t)
    if normalize:
        p *= 2.0 / np.dot(y, y)
    return p
