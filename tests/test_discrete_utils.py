"""Waveform generators + discrete utilities vs the scipy oracle.

Host-side scipy.signal parity surface (waveforms, trend removal, LFSR,
polynomial deconvolution, filter-state construction, relative extrema).
Oracle pattern per /root/reference/tests/parity.rs.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.dsp import correlation_lags, deconvolve, detrend, vectorstrength
from gpu_fft_tpu.ops.iir import lfiltic
from gpu_fft_tpu.ops.peaks import argrelextrema, argrelmax, argrelmin
from gpu_fft_tpu.utils.signal import (
    gausspulse,
    max_len_seq,
    sawtooth,
    square,
    sweep_poly,
    unit_impulse,
)

T = np.linspace(0, 10, 501)
RNG = np.random.default_rng(7)


# ── waveforms ────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("duty", [0.5, 0.3, 0.0, 1.0])
def test_square_matches_scipy(duty):
    np.testing.assert_array_equal(square(T, duty), ss.square(T, duty))


def test_square_array_duty_and_nan():
    duty = np.linspace(0, 1, T.size)
    np.testing.assert_array_equal(square(T, duty), ss.square(T, duty))
    assert np.all(np.isnan(square(T, 1.5)))


@pytest.mark.parametrize("width", [1.0, 0.5, 0.0, 0.25])
def test_sawtooth_matches_scipy(width):
    np.testing.assert_allclose(sawtooth(T, width), ss.sawtooth(T, width), atol=1e-12)


def test_gausspulse_matches_scipy():
    np.testing.assert_allclose(gausspulse(T - 5, fc=2, bw=0.4),
                               ss.gausspulse(T - 5, fc=2, bw=0.4), atol=1e-12)
    ours = gausspulse(T - 5, fc=2, retquad=True, retenv=True)
    ref = ss.gausspulse(T - 5, fc=2, retquad=True, retenv=True)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, atol=1e-12)
    assert abs(gausspulse("cutoff", fc=2, bw=0.4, tpr=-50)
               - ss.gausspulse("cutoff", fc=2, bw=0.4, tpr=-50)) < 1e-12


def test_sweep_poly_matches_scipy():
    p = np.poly1d([0.05, -0.75, 2.0, 1.0])
    np.testing.assert_allclose(sweep_poly(T, p, phi=30), ss.sweep_poly(T, p, phi=30),
                               atol=1e-9)


def test_unit_impulse_matches_scipy():
    np.testing.assert_array_equal(unit_impulse(7, 2), ss.unit_impulse(7, 2))
    np.testing.assert_array_equal(unit_impulse((5, 6), "mid"), ss.unit_impulse((5, 6), "mid"))
    np.testing.assert_array_equal(unit_impulse(5), ss.unit_impulse(5))


def test_max_len_seq_matches_scipy():
    s1, st1 = max_len_seq(6)
    s2, st2 = ss.max_len_seq(6)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(st1, st2)
    state = [1, 0, 1, 0, 1, 0, 1, 1]
    s1, st1 = max_len_seq(8, state=state, length=100)
    s2, st2 = ss.max_len_seq(8, state=state, length=100)
    np.testing.assert_array_equal(s1, s2)
    np.testing.assert_array_equal(st1, st2)


def test_max_len_seq_has_mls_spectrum():
    # Defining property: the periodic autocorrelation of a ±1 m-sequence
    # is n at lag 0 and −1 everywhere else.
    seq, _ = max_len_seq(7)
    x = 2.0 * seq - 1.0
    n = x.size
    ac = np.round(np.real(np.fft.ifft(np.abs(np.fft.fft(x)) ** 2)))
    assert ac[0] == n and np.all(ac[1:] == -1.0)


def test_max_len_seq_validates():
    with pytest.raises(ValueError):
        max_len_seq(40)
    with pytest.raises(ValueError):
        max_len_seq(6, state=np.zeros(6))


# ── trend removal / correlation / events ─────────────────────────────────────


def test_detrend_matches_scipy():
    x = RNG.standard_normal((4, 200)) + np.linspace(0, 3, 200)
    np.testing.assert_allclose(detrend(x), ss.detrend(x), atol=1e-10)
    np.testing.assert_allclose(detrend(x, type="constant"), ss.detrend(x, type="constant"),
                               atol=1e-12)
    np.testing.assert_allclose(detrend(x, bp=[50, 120]), ss.detrend(x, bp=[50, 120]),
                               atol=1e-10)
    np.testing.assert_allclose(detrend(x.T, axis=0), ss.detrend(x.T, axis=0), atol=1e-10)
    with pytest.raises(ValueError):
        detrend(x, type="bogus")


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_correlation_lags_matches_scipy(mode):
    for n1, n2 in [(20, 14), (14, 20), (16, 16)]:
        np.testing.assert_array_equal(correlation_lags(n1, n2, mode),
                                      ss.correlation_lags(n1, n2, mode))


def test_correlation_lags_indexes_the_peak():
    # The lag array must locate a known shift through fft_correlate.
    from gpu_fft_tpu.ops.dsp import fft_correlate

    x = RNG.standard_normal(128).astype(np.float32)
    y = np.roll(x, 9)
    corr = fft_correlate(y, x, mode="full")
    lags = correlation_lags(y.size, x.size, "full")
    assert lags[int(np.argmax(corr))] == 9


def test_vectorstrength_matches_scipy():
    ev = RNG.uniform(0, 100, 64)
    o, r = vectorstrength(ev, 7.3), ss.vectorstrength(ev, 7.3)
    np.testing.assert_allclose(o, r, atol=1e-12)
    o, r = vectorstrength(ev, [5.0, 7.3]), ss.vectorstrength(ev, [5.0, 7.3])
    np.testing.assert_allclose(o[0], r[0], atol=1e-12)
    np.testing.assert_allclose(o[1], r[1], atol=1e-12)
    strength, _ = vectorstrength(np.arange(10) * 2.5, 2.5)  # perfectly locked
    assert abs(strength - 1.0) < 1e-12


def test_deconvolve_matches_scipy():
    sig = ss.convolve([1.0, 2.0, 3.0], [1.0, 1.0, 0.5]) + np.r_[0.1, np.zeros(4)]
    q1, r1 = deconvolve(sig, [1.0, 1.0, 0.5])
    q2, r2 = ss.deconvolve(sig, [1.0, 1.0, 0.5])
    np.testing.assert_allclose(q1, q2, atol=1e-12)
    np.testing.assert_allclose(r1, r2, atol=1e-12)
    # reconstruction identity
    np.testing.assert_allclose(ss.convolve([1.0, 1.0, 0.5], q1) + r1, sig, atol=1e-12)


def test_lfiltic_matches_scipy_and_continues_streams():
    b, a = ss.butter(4, 0.3)
    y_past, x_past = [0.5, -0.2, 0.3, 0.1], [1.0, 0.2, -0.1, 0.4]
    np.testing.assert_allclose(lfiltic(b, a, y_past, x_past),
                               ss.lfiltic(b, a, y_past, x_past), atol=1e-14)
    np.testing.assert_allclose(lfiltic([1.0, 0.5], a, [0.5]),
                               ss.lfiltic([1.0, 0.5], a, [0.5]), atol=1e-14)
    # End-to-end: zi from lfiltic continues a split stream exactly.
    from gpu_fft_tpu.ops.iir import lfilter

    x = RNG.standard_normal(256)
    full = ss.lfilter(b, a, x)
    zi = lfiltic(b, a, full[:128][::-1], x[:128][::-1])
    tail, _ = lfilter(b, a, x[128:], zi=zi)
    np.testing.assert_allclose(tail, full[128:], atol=1e-5)


# ── relative extrema ─────────────────────────────────────────────────────────


@pytest.mark.parametrize("order", [1, 3])
def test_argrel_matches_scipy(order):
    y = RNG.standard_normal(100)
    np.testing.assert_array_equal(argrelmax(y, order=order)[0],
                                  ss.argrelmax(y, order=order)[0])
    np.testing.assert_array_equal(argrelmin(y, order=order)[0],
                                  ss.argrelmin(y, order=order)[0])


def test_argrelextrema_2d_matches_scipy():
    y = RNG.standard_normal((30, 40))
    o = argrelextrema(y, np.greater, axis=1, order=2)
    r = ss.argrelextrema(y, np.greater, axis=1, order=2)
    np.testing.assert_array_equal(o[0], r[0])
    np.testing.assert_array_equal(o[1], r[1])


def test_wave_c_reachable_from_namespaces():
    import gpu_fft_tpu
    import gpu_fft_tpu.signal as sig

    for mod in (gpu_fft_tpu, sig):
        for name in ("square", "sawtooth", "gausspulse", "sweep_poly", "unit_impulse",
                     "max_len_seq", "detrend", "correlation_lags", "vectorstrength",
                     "deconvolve", "lfiltic", "argrelmax", "argrelmin", "argrelextrema"):
            assert callable(getattr(mod, name)), name
