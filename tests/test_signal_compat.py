"""scipy.signal-flavored namespace (gpu_fft_tpu.signal) — oracle: scipy.signal.

The underlying implementations are element-wise tested in their own suites;
these tests pin the NAME mapping and the complex packing against scipy.
"""

import numpy as np
import pytest
import scipy.signal as ss

import gpu_fft_tpu.signal as gsig


@pytest.fixture(scope="module")
def sig():
    rng = np.random.default_rng(5)
    t = np.arange(2048) / 1e3
    x = np.sin(2 * np.pi * 97.0 * t) + 0.3 * rng.standard_normal(t.size)
    y = np.roll(x, 5) + 0.1 * rng.standard_normal(t.size)
    return x.astype(np.float32), y.astype(np.float32)


def test_hilbert_complex(sig):
    x, _ = sig
    got = gsig.hilbert(x)
    ref = ss.hilbert(x.astype(np.float64))
    assert np.iscomplexobj(got)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5
    # N crops and pads like scipy
    for N in (1024, 4096):
        got = gsig.hilbert(x, N=N)
        ref = ss.hilbert(x.astype(np.float64), N=N)
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5


def test_csd_complex(sig):
    x, y = sig
    f, got = gsig.csd(x, y, fs=1e3, nperseg=256)
    fr, ref = ss.csd(x.astype(np.float64), y.astype(np.float64), fs=1e3, nperseg=256)
    assert np.iscomplexobj(got)
    assert np.allclose(f, fr)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 1e-4


def test_stft_istft_complex(sig):
    x, _ = sig
    f, t, Z = gsig.stft(x, fs=1e3, nperseg=256)
    fr, tr, Zr = ss.stft(x.astype(np.float64), fs=1e3, nperseg=256)
    assert np.iscomplexobj(Z) and Z.shape == Zr.shape
    assert np.allclose(f, fr) and np.allclose(t, tr)
    assert np.abs(Z - Zr).max() / np.abs(Zr).max() < 1e-4
    tt, back = gsig.istft(Z, fs=1e3, nperseg=256)
    _, back_ref = ss.istft(Zr, fs=1e3, nperseg=256)
    assert np.abs(back[: x.size] - x).max() < 1e-3
    assert back.shape == back_ref.shape


def test_czt_zoom_complex(sig):
    x, _ = sig
    got = gsig.czt(x[:500])
    ref = ss.czt(x[:500].astype(np.float64))
    assert np.iscomplexobj(got)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5
    got = gsig.zoom_fft(x[:500], [90.0, 110.0], m=64, fs=1e3)
    ref = ss.zoom_fft(x[:500].astype(np.float64), [90.0, 110.0], m=64, fs=1e3)
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5


def test_convolve_correlate_names(sig):
    x, y = sig
    a, b = x[:777], y[:64]
    got = gsig.convolve(a, b)
    ref = ss.convolve(a.astype(np.float64), b.astype(np.float64))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5
    got = gsig.correlate(a, b, mode="valid")
    ref = ss.correlate(a.astype(np.float64), b.astype(np.float64), mode="valid")
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-5
    with pytest.raises(ValueError, match="method"):
        gsig.convolve(a, b, method="direct")


def test_reexported_estimators_match_scipy(sig):
    x, _ = sig
    f, p = gsig.welch(x, fs=1e3, nperseg=256)
    fr, pr = ss.welch(x.astype(np.float64), fs=1e3, nperseg=256)
    assert np.allclose(f, fr) and np.abs(p - pr).max() / pr.max() < 1e-4
    f, p = gsig.periodogram(x, fs=1e3)
    fr, pr = ss.periodogram(x.astype(np.float64), fs=1e3)
    assert np.allclose(f, fr) and np.abs(p - pr).max() / pr.max() < 1e-4


def test_get_window(sig):
    w = gsig.get_window("hann", 128)
    ref = ss.get_window("hann", 128, fftbins=True)
    assert np.abs(w - ref).max() < 1e-6
    w = gsig.get_window(("kaiser", 8.6), 64)
    ref = ss.get_window(("kaiser", 8.6), 64, fftbins=True)
    assert np.abs(w - ref).max() < 1e-5
    # symmetric form now supported via the windows module
    w = gsig.get_window("hann", 128, fftbins=False)
    ref = ss.get_window("hann", 128, fftbins=False)
    assert np.abs(w - ref).max() < 1e-12
    w = gsig.get_window("tukey", 65, fftbins=False)
    ref = ss.get_window("tukey", 65, fftbins=False)
    assert np.abs(w - ref).max() < 1e-12


def test_multirate_names(sig):
    x, _ = sig
    h = gsig.firwin(31, 0.3)
    got = gsig.upfirdn(h, x[:1000], up=3, down=5)
    ref = ss.upfirdn(h.astype(np.float64), x[:1000].astype(np.float64), up=3, down=5)
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() / max(1.0, np.abs(ref).max()) < 3e-5
    got = gsig.resample_poly(x[:1000], 2, 3)
    ref = ss.resample_poly(x[:1000].astype(np.float64), 2, 3)
    assert got.shape == ref.shape
