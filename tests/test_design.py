"""IIR design functions vs the scipy oracle.

Coefficient-exact for ba (same algorithm: prototype -> lp2* -> bilinear ->
poly), response-exact for sos (pairing may order sections differently, so
the CASCADE's frequency response is the invariant), order-exact with
Wn within scipy's own fminbound tolerance for the *ord trio.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.design import (
    bilinear,
    butter,
    buttord,
    cheb1ord,
    cheb2ord,
    cheby1,
    cheby2,
    iirfilter,
    iirnotch,
    iirpeak,
    zpk2sos,
    zpk2tf,
)

W = np.linspace(1e-3, np.pi - 1e-3, 512)

BTYPES = [("low", 0.3), ("high", 0.4), ("bandpass", [0.2, 0.5]), ("bandstop", [0.25, 0.6])]


def _resp(b, a):
    return ss.freqz(b, a, worN=W)[1]


def _sos_resp(sos):
    h = np.ones_like(W, dtype=complex)
    for sec in np.atleast_2d(sos):
        h *= _resp(sec[:3], sec[3:])
    return h


@pytest.mark.parametrize("btype,Wn", BTYPES)
@pytest.mark.parametrize("order", [1, 2, 3, 5, 8])
def test_butter_ba_matches_scipy(btype, Wn, order):
    ours = butter(order, Wn, btype=btype)
    ref = ss.butter(order, Wn, btype=btype)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-9, atol=1e-12 * np.abs(r).max())


@pytest.mark.parametrize("btype,Wn", BTYPES)
def test_cheby_ba_matches_scipy(btype, Wn):
    for order in (2, 4, 7):
        ours = cheby1(order, 1.0, Wn, btype=btype)
        ref = ss.cheby1(order, 1.0, Wn, btype=btype)
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o, r, rtol=1e-8, atol=1e-11 * np.abs(r).max())
        ours = cheby2(order, 40.0, Wn, btype=btype)
        ref = ss.cheby2(order, 40.0, Wn, btype=btype)
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o, r, rtol=1e-8, atol=1e-11 * np.abs(r).max())


@pytest.mark.parametrize("ftype,extra", [("butter", {}), ("cheby1", {"rp": 1.0}), ("cheby2", {"rs": 40.0})])
@pytest.mark.parametrize("btype,Wn", BTYPES)
def test_sos_cascade_response_matches(ftype, extra, btype, Wn):
    order = 5
    sos = iirfilter(order, Wn, btype=btype, ftype=ftype, output="sos", **extra)
    ref = ss.iirfilter(order, Wn, btype=btype, ftype=ftype, output="ba", **extra)
    hr = _resp(*ref)
    np.testing.assert_allclose(_sos_resp(sos), hr, rtol=0, atol=1e-7 * np.abs(hr).max())


def test_zpk_output_and_fs_units():
    z, p, k = butter(4, 100.0, fs=1000.0, output="zpk")
    zr, pr, kr = ss.butter(4, 100.0, fs=1000.0, output="zpk")
    np.testing.assert_allclose(np.sort_complex(p), np.sort_complex(pr), rtol=1e-9)
    np.testing.assert_allclose(k, kr, rtol=1e-9)
    assert len(z) == len(zr)


def test_designed_filter_through_the_engine():
    # The point of the module: design here, filter on the device engine.
    from gpu_fft_tpu.ops.iir import lfilter, sosfilt

    b, a = butter(4, 0.2)
    x = np.random.default_rng(0).standard_normal(2048).astype(np.float32)
    np.testing.assert_allclose(lfilter(b, a, x), ss.lfilter(b, a, x), atol=2e-4)
    sos = butter(6, 0.25, output="sos")
    ref = ss.sosfilt(ss.butter(6, 0.25, output="sos"), x)
    np.testing.assert_allclose(sosfilt(sos, x), ref, atol=5e-4)


@pytest.mark.parametrize(
    "case",
    [
        (0.2, 0.3, 1, 40),
        (0.4, 0.3, 1, 40),
        ([0.2, 0.5], [0.1, 0.6], 2, 40),
        ([0.1, 0.6], [0.2, 0.5], 2, 40),
        (0.1, 0.15, 0.5, 60),
    ],
)
def test_ord_trio_matches_scipy(case):
    for ours, ref in ((buttord, ss.buttord), (cheb1ord, ss.cheb1ord), (cheb2ord, ss.cheb2ord)):
        no, wo = ours(*case)
        nr, wr = ref(*case)
        assert no == nr
        # Bandstop edges come from an inner 1-D optimization; scipy's own
        # fminbound tolerance is 1e-5, ours converges tighter.
        np.testing.assert_allclose(np.asarray(wo), np.asarray(wr), atol=2e-5)


def test_ord_fs_units():
    n, wn = buttord(200.0, 300.0, 1, 40, fs=2000.0)
    nr, wr = ss.buttord(200.0, 300.0, 1, 40, fs=2000.0)
    assert n == nr
    np.testing.assert_allclose(wn, wr, rtol=1e-9)


def test_notch_peak_biquads_match_scipy():
    for fn, ref in ((iirnotch, ss.iirnotch), (iirpeak, ss.iirpeak)):
        for w0, q, fs in ((60.0, 30.0, 1000.0), (0.3, 5.0, 2.0), (250.0, 15.0, 1000.0)):
            ours = np.concatenate(fn(w0, q, fs=fs))
            theirs = np.concatenate(ref(w0, q, fs=fs))
            np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_bilinear_matches_scipy():
    b, a = ss.butter(3, 1.0, analog=True)
    ours = bilinear(b, a, fs=10.0)
    ref = ss.bilinear(b, a, fs=10.0)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, atol=1e-12)


def test_zpk_helpers():
    z, p, k = ss.butter(5, 0.3, output="zpk")
    bo, ao = zpk2tf(z, p, k)
    br, ar = ss.zpk2tf(z, p, k)
    np.testing.assert_allclose(bo, br, atol=1e-12)
    np.testing.assert_allclose(ao, ar, atol=1e-12)
    sos = zpk2sos(z, p, k)
    hr = _resp(br, ar)
    np.testing.assert_allclose(_sos_resp(sos), hr, rtol=0, atol=1e-8 * np.abs(hr).max())


def test_design_validation():
    with pytest.raises(ValueError):
        butter(0, 0.3)
    with pytest.raises(ValueError):
        butter(2, 1.5)  # digital Wn out of (0, 1)
    with pytest.raises(ValueError):
        butter(2, [0.5, 0.2], btype="bandpass")  # unordered edges
    with pytest.raises(ValueError):
        iirfilter(3, 0.3, ftype="ellip")
    with pytest.raises(ValueError):
        cheby1(3, None, 0.3)
    with pytest.raises(ValueError):
        iirfilter(3, 0.3, output="latex")
    with pytest.raises(ValueError):
        buttord(0.2, 0.3, 40, 1)  # gpass >= gstop
    with pytest.raises(ValueError):
        iirnotch(600.0, 30.0, fs=1000.0)  # w0 beyond Nyquist
