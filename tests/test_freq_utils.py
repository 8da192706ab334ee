"""numpy.fft utility parity: fftfreq/rfftfreq/next_fast_len/hfft/ihfft.

Closes the last numpy.fft surface gaps (the reference has no analog —
extension beyond parity; fftshift/ifftshift landed earlier in ops/dsp.py).
"""

import numpy as np
import pytest

from gpu_fft_tpu import fftfreq, hfft, ihfft, next_fast_len, rfftfreq


@pytest.mark.parametrize("n", [1, 4, 5, 1024])
@pytest.mark.parametrize("d", [1.0, 0.25, 1e-3])
def test_fftfreq_matches_numpy(n, d):
    np.testing.assert_allclose(fftfreq(n, d), np.fft.fftfreq(n, d), rtol=1e-6)


@pytest.mark.parametrize("n", [1, 4, 5, 1024])
def test_rfftfreq_matches_numpy(n):
    np.testing.assert_allclose(rfftfreq(n, 0.5), np.fft.rfftfreq(n, 0.5), rtol=1e-6)


def test_freq_rejects_bad_n():
    with pytest.raises(ValueError):
        fftfreq(0)
    with pytest.raises(ValueError):
        rfftfreq(0)
    with pytest.raises(ValueError):
        next_fast_len(0)


@pytest.mark.parametrize(
    "target,expected", [(1, 2), (2, 2), (3, 4), (1000, 1024), (1024, 1024), (1025, 2048)]
)
def test_next_fast_len(target, expected):
    assert next_fast_len(target) == expected
    assert next_fast_len(target, real=True) == expected


@pytest.mark.parametrize("n", [16, 256, 4096])
def test_hfft_matches_numpy(n):
    rng = np.random.default_rng(n)
    h = n // 2 + 1
    a = rng.standard_normal(h).astype(np.float32) + 1j * rng.standard_normal(h).astype(
        np.float32
    )
    got = hfft(a.real, a.imag)
    ref = np.fft.hfft(a.astype(np.complex128))
    assert got.shape == ref.shape
    bound = 5 * np.log2(n) * np.finfo(np.float32).eps
    assert np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9) < bound


@pytest.mark.parametrize("n", [16, 256, 4096])
def test_ihfft_matches_numpy(n):
    rng = np.random.default_rng(n + 1)
    x = rng.standard_normal(n).astype(np.float32)
    gr, gi = ihfft(x)
    ref = np.fft.ihfft(x.astype(np.float64))
    bound = 5 * np.log2(n) * np.finfo(np.float32).eps
    scale = max(np.abs(ref).max(), 1e-9)
    assert np.abs(gr - ref.real).max() / scale < bound
    assert np.abs(gi - ref.imag).max() / scale < bound


def test_hfft_ihfft_roundtrip():
    rng = np.random.default_rng(3)
    h = 129  # n = 256
    a = rng.standard_normal(h).astype(np.float32) + 1j * rng.standard_normal(h).astype(
        np.float32
    )
    a[0] = a[0].real  # Hermitian endpoints
    a[-1] = a[-1].real
    spec = hfft(a.real, a.imag)
    br, bi = ihfft(spec)
    np.testing.assert_allclose(br, a.real, atol=2e-5 * np.abs(spec).max())
    np.testing.assert_allclose(bi, a.imag, atol=2e-5 * np.abs(spec).max())


def test_hfft_validates():
    with pytest.raises(ValueError):
        hfft([1.0, 2.0, 3.0], [0.0, 0.0])  # shape mismatch
    with pytest.raises(ValueError):
        hfft([1.0], [0.0])  # too short
    with pytest.raises(ValueError):
        ihfft(np.ones(48, np.float32))  # not a power of two
