"""Signal utilities, matching the reference's ``src/utils.rs`` semantics.

All functions are pure host-side NumPy — they sit beside the transforms, not
inside them, exactly like the reference's CPU-only utils layer (SURVEY §1).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "generate_sine_wave",
    "calculate_frequencies",
    "calculate_one_sided_frequencies",
    "find_dominant_frequencies",
    "fftfreq",
    "rfftfreq",
    "chirp",
]


def generate_sine_wave(frequency: float, sample_rate: float, duration: float) -> np.ndarray:
    """sin(2π f n / sr) for n in [0, sample_rate * duration) samples
    (reference ``src/utils.rs:26-31``).

    >>> w = generate_sine_wave(1.0, 4.0, 1.0)   # one cycle at 4 samples/s
    >>> [round(float(v), 6) for v in w]
    [0.0, 1.0, -0.0, -1.0]
    """
    num_samples = int(sample_rate * duration)
    n = np.arange(num_samples, dtype=np.float32)
    return np.sin(2.0 * np.pi * frequency * n / sample_rate).astype(np.float32)


def calculate_frequencies(n: int, sample_rate: float) -> np.ndarray:
    """Two-sided bin -> Hz map: bin k is k * sample_rate / n
    (reference ``src/utils.rs:50-52``).

    >>> calculate_frequencies(4, 100.0).tolist()
    [0.0, 25.0, 50.0, 75.0]
    """
    return (np.arange(n, dtype=np.float32) * np.float32(sample_rate) / np.float32(n)).astype(
        np.float32
    )


def calculate_one_sided_frequencies(n_total: int, sample_rate: float) -> np.ndarray:
    """The n_total // 2 + 1 unique non-negative frequencies, 0 Hz ... Nyquist
    (reference ``src/utils.rs:71-75``).

    >>> calculate_one_sided_frequencies(8, 100.0).tolist()
    [0.0, 12.5, 25.0, 37.5, 50.0]
    """
    k = np.arange(n_total // 2 + 1, dtype=np.float32)
    return (k * np.float32(sample_rate) / np.float32(n_total)).astype(np.float32)


def fftfreq(n: int, d: float = 1.0) -> np.ndarray:
    """Signed DFT bin frequencies, ``numpy.fft.fftfreq`` semantics: the
    upper half of the spectrum maps to NEGATIVE frequencies (unlike
    :func:`calculate_frequencies`, which mirrors the reference's unsigned
    0..(n-1)·fs/n map).

    >>> fftfreq(4, d=0.25).tolist()
    [0.0, 1.0, -2.0, -1.0]
    """
    return np.fft.fftfreq(n, d=d).astype(np.float32)


def rfftfreq(n: int, d: float = 1.0) -> np.ndarray:
    """One-sided bin frequencies for ``rfft`` output, ``numpy.fft.rfftfreq``
    semantics (equivalent to :func:`calculate_one_sided_frequencies` with
    ``sample_rate = 1/d``).

    >>> rfftfreq(8, d=0.01).tolist()
    [0.0, 12.5, 25.0, 37.5, 50.0]
    """
    return np.fft.rfftfreq(n, d=d).astype(np.float32)


def chirp(
    t,
    f0: float,
    t1: float,
    f1: float,
    method: str = "linear",
    phi: float = 0.0,
    vertex_zero: bool = True,
) -> np.ndarray:
    """Frequency-swept cosine, ``scipy.signal.chirp`` semantics: the
    instantaneous frequency sweeps from ``f0`` at t=0 to ``f1`` at ``t1``
    along a linear / quadratic / logarithmic / hyperbolic law; ``phi`` is
    the initial phase in degrees.  Generators sit host-side beside
    :func:`generate_sine_wave` (extension — the reference only has the
    single-tone generator, ``src/utils.rs:26-31``).

    >>> t = np.linspace(0.0, 1.0, 5)
    >>> bool(np.allclose(chirp(t, 2.0, 1.0, 2.0), np.cos(4 * np.pi * t), atol=1e-6))
    True
    """
    t = np.asarray(t, dtype=np.float64)
    f0, t1, f1 = float(f0), float(t1), float(f1)
    if method in ("linear", "lin", "li"):
        beta = (f1 - f0) / t1
        phase = 2.0 * np.pi * (f0 * t + 0.5 * beta * t * t)
    elif method in ("quadratic", "quad", "q"):
        beta = (f1 - f0) / (t1 * t1)
        if vertex_zero:
            phase = 2.0 * np.pi * (f0 * t + beta * t**3 / 3.0)
        else:
            phase = 2.0 * np.pi * (f1 * t + beta * ((t1 - t) ** 3 - t1**3) / 3.0)
    elif method in ("logarithmic", "log", "lo"):
        if f0 * f1 <= 0.0:
            raise ValueError("logarithmic chirp requires f0 and f1 to be nonzero and same-sign")
        if f0 == f1:
            phase = 2.0 * np.pi * f0 * t
        else:
            beta = t1 / np.log(f1 / f0)
            phase = 2.0 * np.pi * beta * f0 * (np.power(f1 / f0, t / t1) - 1.0)
    elif method in ("hyperbolic", "hyp"):
        if f0 == 0.0 or f1 == 0.0:
            raise ValueError("hyperbolic chirp requires nonzero f0 and f1")
        if f0 == f1:
            phase = 2.0 * np.pi * f0 * t
        else:
            sing = -f1 * t1 / (f0 - f1)
            phase = 2.0 * np.pi * (-sing * f0) * np.log(np.abs(1.0 - t / sing))
    else:
        raise ValueError(
            f"method must be linear, quadratic, logarithmic or hyperbolic, got {method!r}"
        )
    return np.cos(phase + np.deg2rad(phi)).astype(np.float32)


def find_dominant_frequencies(psd, frequencies, threshold: float) -> list[tuple[float, float]]:
    """Local peaks above threshold; endpoints excluded
    (reference ``src/utils.rs:100-110``).

    A peak strictly exceeds both neighbors and the threshold.  Returns
    (frequency, power) pairs in ascending bin order.

    >>> find_dominant_frequencies([0.0, 9.0, 1.0, 8.0, 0.0], [0.0, 1.0, 2.0, 3.0, 4.0], 5.0)
    [(1.0, 9.0), (3.0, 8.0)]
    >>> find_dominant_frequencies([9.0, 1.0, 0.0], [0.0, 1.0, 2.0], 5.0)  # endpoint excluded
    []
    """
    p = np.asarray(psd, dtype=np.float32)
    f = np.asarray(frequencies, dtype=np.float32)
    if p.shape != f.shape:
        raise ValueError(
            f"psd and frequencies must have the same length, got {p.shape} vs {f.shape}"
        )
    if p.shape[0] < 3:
        return []
    mid = p[1:-1]
    mask = (mid > p[:-2]) & (mid > p[2:]) & (mid > threshold)
    idx = np.nonzero(mask)[0] + 1
    return [(float(f[i]), float(p[i])) for i in idx]
