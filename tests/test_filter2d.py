"""2-D filtering, rank filters, analytic signal, STFT checks, CZT plans
vs the scipy oracle.

convolve2d/correlate2d are exercised per (mode × boundary); the f32 fft2
engine bounds coefficient error at ~1e-6 relative.  Rank filters are exact
(pure order statistics).  check_COLA/check_NOLA use f64 windows so the
boolean gates match scipy bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.czt import CZT, ZoomFFT
from gpu_fft_tpu.ops.dsp import gauss_spline, hilbert2
from gpu_fft_tpu.ops.filter import choose_conv_method, convolve2d, correlate2d
from gpu_fft_tpu.ops.rank import medfilt, medfilt2d, order_filter, wiener
from gpu_fft_tpu.ops.stft import check_COLA, check_NOLA

RNG = np.random.default_rng(23)
IMG = RNG.standard_normal((20, 24))
KER = RNG.standard_normal((4, 3))


# ── rank / local-statistics filters (exact) ──────────────────────────────────


def test_medfilt_matches_scipy():
    x = RNG.standard_normal(50)
    np.testing.assert_array_equal(medfilt(x, 5), ss.medfilt(x, 5))
    np.testing.assert_array_equal(medfilt2d(IMG, 5), ss.medfilt2d(IMG, 5))
    np.testing.assert_array_equal(medfilt2d(IMG, (3, 5)), ss.medfilt2d(IMG, (3, 5)))
    with pytest.raises(ValueError):
        medfilt(x, 4)  # even window


def test_order_filter_matches_scipy():
    dom = np.ones((3, 3))
    dom[0, 0] = 0
    np.testing.assert_array_equal(order_filter(IMG, dom, 3), ss.order_filter(IMG, dom, 3))
    np.testing.assert_array_equal(order_filter(IMG, np.ones((3, 3)), 4),
                                  ss.medfilt2d(IMG, 3))  # rank 4 of 9 = median
    with pytest.raises(ValueError):
        order_filter(IMG, np.ones((2, 3)), 1)


def test_wiener_matches_scipy():
    np.testing.assert_allclose(wiener(IMG, 5), ss.wiener(IMG, 5), atol=1e-12)
    np.testing.assert_allclose(wiener(IMG, (3, 5), 0.5), ss.wiener(IMG, (3, 5), 0.5),
                               atol=1e-12)


# ── 2-D convolution with boundaries ──────────────────────────────────────────


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
def test_convolve2d_matches_scipy(mode, boundary):
    ref = ss.convolve2d(IMG, KER, mode, boundary)
    np.testing.assert_allclose(convolve2d(IMG, KER, mode, boundary), ref,
                               atol=2e-5 * np.abs(ref).max())


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("boundary", ["fill", "wrap", "symm"])
def test_correlate2d_matches_scipy(mode, boundary):
    ref = ss.correlate2d(IMG, KER, mode, boundary)
    np.testing.assert_allclose(correlate2d(IMG, KER, mode, boundary), ref,
                               atol=2e-5 * np.abs(ref).max())


def test_convolve2d_fillvalue():
    ref = ss.convolve2d(IMG, KER, "same", "fill", 2.5)
    np.testing.assert_allclose(convolve2d(IMG, KER, "same", "fill", 2.5), ref,
                               atol=2e-5 * np.abs(ref).max())


def test_choose_conv_method():
    assert choose_conv_method(np.ones(10000), np.ones(1000)) == "fft"
    assert choose_conv_method(np.ones(8), np.ones(3)) == "direct"
    method, times = choose_conv_method(RNG.standard_normal(256),
                                       RNG.standard_normal(32), measure=True)
    assert method in ("fft", "direct") and set(times) == {"fft", "direct"}


# ── 2-D analytic signal ──────────────────────────────────────────────────────


def test_hilbert2_matches_scipy():
    for arr in (IMG, IMG[:19, :21]):
        ref = ss.hilbert2(arr)
        np.testing.assert_allclose(hilbert2(arr), ref, atol=1e-5 * np.abs(ref).max())
    ref = ss.hilbert2(IMG, N=(32, 32))
    np.testing.assert_allclose(hilbert2(IMG, N=(32, 32)), ref,
                               atol=1e-5 * np.abs(ref).max())
    with pytest.raises(ValueError):
        hilbert2(IMG.astype(complex))


def test_gauss_spline_matches_scipy():
    x = np.linspace(-3, 3, 31)
    np.testing.assert_allclose(gauss_spline(x, 4), ss.gauss_spline(x, 4), atol=1e-14)


# ── STFT window invertibility gates ──────────────────────────────────────────


@pytest.mark.parametrize("win,nperseg,noverlap", [
    ("hann", 256, 128), ("hann", 256, 64), ("blackman", 200, 150),
    ("hamming", 256, 100), ("bartlett", 128, 64),
])
def test_check_cola_nola_match_scipy(win, nperseg, noverlap):
    assert check_COLA(win, nperseg, noverlap) == ss.check_COLA(win, nperseg, noverlap)
    assert check_NOLA(win, nperseg, noverlap) == ss.check_NOLA(win, nperseg, noverlap)


def test_check_cola_array_window_and_validation():
    assert check_COLA(np.ones(64), 64, 32) == ss.check_COLA(np.ones(64), 64, 32)
    with pytest.raises(ValueError):
        check_COLA("hann", 64, 64)  # noverlap >= nperseg


# ── CZT / ZoomFFT plans ──────────────────────────────────────────────────────


def test_czt_plan_matches_scipy():
    x = RNG.standard_normal(128)
    plan = CZT(128, m=40, w=np.exp(-2j * np.pi / 200), a=1.0)
    ref = ss.CZT(128, m=40, w=np.exp(-2j * np.pi / 200), a=1.0)
    np.testing.assert_allclose(plan(x), ref(x), atol=2e-5 * np.abs(ref(x)).max())
    np.testing.assert_allclose(plan.points(), ref.points(), atol=1e-12)
    batched = plan(np.stack([x, 2 * x]), axis=-1)
    np.testing.assert_allclose(batched[1], 2 * batched[0], atol=1e-4)
    with pytest.raises(ValueError):
        plan(x[:100])


def test_zoomfft_plan_matches_scipy():
    x = RNG.standard_normal(128)
    for fn in ([10, 40], 30.0):
        zf = ZoomFFT(128, fn, m=64, fs=100)
        zr = ss.ZoomFFT(128, fn, m=64, fs=100)
        ref = zr(x)
        np.testing.assert_allclose(zf(x), ref, atol=2e-5 * np.abs(ref).max())


def test_wave_d_reachable_from_namespaces():
    import gpu_fft_tpu
    import gpu_fft_tpu.signal as sig

    for mod in (gpu_fft_tpu, sig):
        for name in ("convolve2d", "correlate2d", "choose_conv_method",
                     "medfilt", "medfilt2d", "order_filter", "wiener",
                     "hilbert2", "gauss_spline", "check_COLA", "check_NOLA",
                     "CZT", "ZoomFFT"):
            assert getattr(mod, name, None) is not None, name
