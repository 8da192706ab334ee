"""Parity tests for the round-3 scipy.signal additions: find_peaks /
peak_prominences / peak_widths, chirp, savgol, freqz, lombscargle.

Oracle pattern of ``tests/parity.rs`` (SURVEY §4): the independent
implementation — here scipy itself — must agree element-wise.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.filter import freqz, savgol_coeffs, savgol_filter
from gpu_fft_tpu.ops.peaks import find_peaks, peak_prominences, peak_widths
from gpu_fft_tpu.ops.spectral import lombscargle
from gpu_fft_tpu.utils.signal import chirp


def _noisy(n=500, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 10, n)
    return np.sin(2 * np.pi * 1.3 * t) + 0.6 * np.sin(2 * np.pi * 3.7 * t) + 0.3 * rng.standard_normal(n)


# ---------------------------------------------------------------- find_peaks


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_find_peaks_bare_matches_scipy(seed):
    x = _noisy(seed=seed)
    ours, _ = find_peaks(x)
    ref, _ = ss.find_peaks(x)
    np.testing.assert_array_equal(ours, ref)


def test_find_peaks_plateaus():
    x = np.array([0, 1, 1, 1, 0, 2, 2, 0, 3, 0, 1, 1], dtype=float)
    ours, props = find_peaks(x, plateau_size=1)
    ref, rprops = ss.find_peaks(x, plateau_size=1)
    np.testing.assert_array_equal(ours, ref)
    np.testing.assert_array_equal(props["plateau_sizes"], rprops["plateau_sizes"])
    np.testing.assert_array_equal(props["left_edges"], rprops["left_edges"])
    np.testing.assert_array_equal(props["right_edges"], rprops["right_edges"])


@pytest.mark.parametrize(
    "kwargs",
    [
        {"height": 0.5},
        {"height": (0.2, 1.2)},
        {"threshold": 0.05},
        {"distance": 25},
        {"prominence": 0.4},
        {"prominence": (0.2, 2.0)},
        {"width": 5},
        {"width": (2, 40), "rel_height": 0.7},
        {"height": 0.1, "distance": 10, "prominence": 0.3, "width": 3},
    ],
)
def test_find_peaks_conditions_match_scipy(kwargs):
    x = _noisy(seed=3)
    ours, props = find_peaks(x, **kwargs)
    ref, rprops = ss.find_peaks(x, **kwargs)
    np.testing.assert_array_equal(ours, ref)
    for key in rprops:
        np.testing.assert_allclose(props[key], rprops[key], atol=1e-10, err_msg=key)


def test_prominences_and_widths_match_scipy():
    x = _noisy(seed=4)
    peaks, _ = ss.find_peaks(x)
    ours = peak_prominences(x, peaks)
    ref = ss.peak_prominences(x, peaks)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, atol=1e-12)
    ow = peak_widths(x, peaks, rel_height=0.5)
    rw = ss.peak_widths(x, peaks, rel_height=0.5)
    for a, b in zip(ow, rw):
        np.testing.assert_allclose(a, b, atol=1e-10)


def test_prominences_wlen_matches_scipy():
    x = _noisy(seed=5)
    peaks, _ = ss.find_peaks(x)
    ours = peak_prominences(x, peaks, wlen=31)
    ref = ss.peak_prominences(x, peaks, wlen=31)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(a, b, atol=1e-12)


def test_find_peaks_validation():
    with pytest.raises(ValueError):
        find_peaks(np.zeros((2, 2)))
    with pytest.raises(ValueError):
        find_peaks(np.zeros(5), distance=0.5)
    with pytest.raises(ValueError):
        peak_prominences(np.zeros(5), [7])


# -------------------------------------------------------------------- chirp


@pytest.mark.parametrize("method", ["linear", "quadratic", "logarithmic", "hyperbolic"])
@pytest.mark.parametrize("vertex_zero", [True, False])
def test_chirp_matches_scipy(method, vertex_zero):
    t = np.linspace(0, 2.0, 400)
    ours = chirp(t, f0=1.5, t1=2.0, f1=7.0, method=method, phi=30.0, vertex_zero=vertex_zero)
    ref = ss.chirp(t, f0=1.5, t1=2.0, f1=7.0, method=method, phi=30.0, vertex_zero=vertex_zero)
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_chirp_validation():
    with pytest.raises(ValueError):
        chirp([0.0], 1.0, 1.0, -1.0, method="logarithmic")
    with pytest.raises(ValueError):
        chirp([0.0], 0.0, 1.0, 1.0, method="hyperbolic")
    with pytest.raises(ValueError):
        chirp([0.0], 1.0, 1.0, 2.0, method="bogus")


# ------------------------------------------------------------------- savgol


@pytest.mark.parametrize("wl,poly", [(5, 2), (11, 3), (21, 4)])
def test_savgol_coeffs_match_scipy(wl, poly):
    np.testing.assert_allclose(savgol_coeffs(wl, poly), ss.savgol_coeffs(wl, poly), atol=1e-12)
    np.testing.assert_allclose(
        savgol_coeffs(wl, poly, deriv=1, delta=0.5),
        ss.savgol_coeffs(wl, poly, deriv=1, delta=0.5),
        atol=1e-12,
    )
    np.testing.assert_allclose(
        savgol_coeffs(wl, poly, use="dot"), ss.savgol_coeffs(wl, poly, use="dot"), atol=1e-12
    )


@pytest.mark.parametrize("mode", ["interp", "mirror", "nearest", "constant", "wrap"])
def test_savgol_filter_matches_scipy(mode):
    x = _noisy(n=300, seed=6)
    ours = savgol_filter(x, 11, 3, mode=mode)
    ref = ss.savgol_filter(x, 11, 3, mode=mode)
    # Interior convolution rides the f32 device transform; scipy is f64.
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_savgol_filter_deriv_and_axis():
    x = np.stack([_noisy(n=200, seed=7), _noisy(n=200, seed=8)])
    ours = savgol_filter(x, 9, 3, deriv=1, delta=0.05, axis=-1)
    ref = ss.savgol_filter(x, 9, 3, deriv=1, delta=0.05, axis=-1)
    np.testing.assert_allclose(ours, ref, atol=2e-3)  # deriv amplifies by 1/delta
    oursT = savgol_filter(x.T, 9, 3, axis=0)
    refT = ss.savgol_filter(x.T, 9, 3, axis=0)
    np.testing.assert_allclose(oursT, refT, atol=5e-5)


def test_savgol_validation():
    with pytest.raises(ValueError):
        savgol_coeffs(5, 5)
    with pytest.raises(ValueError):
        savgol_filter(np.zeros(10), 4, 2)
    with pytest.raises(ValueError):
        savgol_filter(np.zeros(5), 7, 2, mode="interp")


# -------------------------------------------------------------------- freqz


@pytest.mark.parametrize("worN,whole", [(512, False), (512, True), (100, False)])
def test_freqz_fir_matches_scipy(worN, whole):
    taps = ss.firwin(31, 0.3)
    w, hr, hi = freqz(taps, worN=worN, whole=whole)
    wr, href = ss.freqz(taps, worN=worN, whole=whole)
    np.testing.assert_allclose(w, wr, atol=1e-12)
    np.testing.assert_allclose(hr + 1j * hi, href, atol=2e-5)


def test_freqz_iir_matches_scipy():
    b, a = ss.butter(4, 0.2)
    w, hr, hi = freqz(b, a, worN=256)
    wr, href = ss.freqz(b, a, worN=256)
    np.testing.assert_allclose(w, wr, atol=1e-12)
    np.testing.assert_allclose(hr + 1j * hi, href, atol=1e-4, rtol=1e-4)


def test_freqz_fs_units():
    taps = ss.firwin(15, 0.4)
    w, hr, hi = freqz(taps, worN=64, fs=1000.0)
    wr, href = ss.freqz(taps, worN=64, fs=1000.0)
    np.testing.assert_allclose(w, wr, atol=1e-9)
    np.testing.assert_allclose(hr + 1j * hi, href, atol=2e-5)


def test_freqz_complex_facade():
    import gpu_fft_tpu.signal as gsig

    taps = ss.firwin(15, 0.4)
    w, h = gsig.freqz(taps, worN=64)
    assert np.iscomplexobj(h)
    _, href = ss.freqz(taps, worN=64)
    np.testing.assert_allclose(h, href, atol=2e-5)


# -------------------------------------------------------------- lombscargle


def test_lombscargle_matches_scipy():
    rng = np.random.default_rng(9)
    t = np.sort(rng.uniform(0, 10, 300))
    y = np.sin(2 * np.pi * 1.7 * t) + 0.4 * rng.standard_normal(300)
    freqs = np.linspace(0.1, 30, 500)
    ours = lombscargle(t, y, freqs)
    ref = ss.lombscargle(t, y, freqs)
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def test_lombscargle_options_match_scipy():
    rng = np.random.default_rng(10)
    t = np.sort(rng.uniform(0, 5, 200)) + 3.0
    y = np.cos(2 * np.pi * 0.9 * t) + 1.5  # offset exercises precenter
    freqs = np.linspace(0.2, 12, 301)
    np.testing.assert_allclose(
        lombscargle(t, y, freqs, precenter=True),
        ss.lombscargle(t, y, freqs, precenter=True),
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_allclose(
        lombscargle(t, y, freqs, normalize=True),
        ss.lombscargle(t, y, freqs, normalize=True),
        rtol=1e-8,
        atol=1e-10,
    )


def test_lombscargle_finds_the_tone():
    rng = np.random.default_rng(11)
    t = np.sort(rng.uniform(0, 20, 400))
    w0 = 2 * np.pi * 0.8
    y = np.sin(w0 * t)
    freqs = np.linspace(0.5, 10, 1000)
    p = lombscargle(t, y, freqs)
    assert abs(freqs[np.argmax(p)] - w0) < 0.05


def test_lombscargle_validation():
    with pytest.raises(ValueError):
        lombscargle([0.0, 1.0], [1.0], [1.0])
    with pytest.raises(ZeroDivisionError):
        lombscargle([0.0, 1.0], [1.0, 2.0], [0.0])
