"""Elliptic / Bessel / comb design vs the scipy oracle.

The elliptic prototype is closed-form on Landen-recursion Jacobi
functions (no scipy.special at runtime), so ba output is coefficient-
exact against scipy; sos compares the cascade response (section pairing
may order differently).  Reference analog: the parity-oracle pattern of
/root/reference/tests/parity.rs (independent implementation as the
numerical oracle).
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

from gpu_fft_tpu.ops.design import (
    bessel,
    ellip,
    ellipord,
    iircomb,
    iirfilter,
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


# ── elliptic ─────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("btype,Wn", BTYPES)
@pytest.mark.parametrize("order", [1, 2, 3, 4, 7])
def test_ellip_ba_matches_scipy(btype, Wn, order):
    ours = ellip(order, 0.5, 50, Wn, btype=btype)
    ref = ss.ellip(order, 0.5, 50, Wn, btype=btype)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-7, atol=1e-10 * np.abs(r).max())


def test_ellip_zpk_matches_scipy():
    z1, p1, k1 = ellip(6, 2, 60, 0.7, btype="high", output="zpk")
    z2, p2, k2 = ss.ellip(6, 2, 60, 0.7, btype="high", output="zpk")
    np.testing.assert_allclose(np.sort_complex(z1), np.sort_complex(z2), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.sort_complex(p1), np.sort_complex(p2), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(k1, k2, rtol=1e-9)


def test_ellip_sos_response_matches_scipy():
    ours = ellip(5, 0.5, 60, [0.2, 0.5], btype="bandpass", output="sos")
    ref = ss.ellip(5, 0.5, 60, [0.2, 0.5], btype="bandpass", output="sos")
    np.testing.assert_allclose(_sos_resp(ours), _sos_resp(ref), rtol=0, atol=1e-9)


def test_ellip_analog_and_edge_orders():
    for n in (1, 2):
        ours = ellip(n, 3, 40, 2.0, analog=True)
        ref = ss.ellip(n, 3, 40, 2.0, analog=True)
        for o, r in zip(ours, ref):
            np.testing.assert_allclose(o, r, rtol=1e-9)


def test_ellip_tight_spec_stays_exact():
    # Deep stopband + narrow passband stresses the degree equation.
    ours = ellip(7, 1, 80, 0.1)
    ref = ss.ellip(7, 1, 80, 0.1)
    np.testing.assert_allclose(ours[0], ref[0], rtol=1e-5, atol=1e-9 * np.abs(ref[0]).max())
    np.testing.assert_allclose(ours[1], ref[1], rtol=1e-9)


def test_ellip_equiripple_property():
    # The defining property, independent of scipy: passband magnitude
    # oscillates between 1 and 10**(-rp/20); stopband stays below -rs dB.
    b, a = ellip(5, 1.0, 40, 0.4)
    w, h = ss.freqz(b, a, worN=4096)
    pb = np.abs(h[w <= 0.4 * np.pi * 0.999])
    sb = np.abs(h[w >= 0.48 * np.pi])  # past the (short) transition band
    assert pb.max() <= 1.0 + 1e-9
    assert abs(pb.min() - 10 ** (-1.0 / 20)) < 1e-6  # touches the ripple floor
    assert 20 * np.log10(sb.max()) <= -40.0 + 1e-6


def test_ellip_requires_both_ripples():
    with pytest.raises(ValueError, match="rp.*rs|both"):
        iirfilter(4, 0.3, rp=1.0, ftype="ellip")


@pytest.mark.parametrize(
    "wp,ws",
    [(0.2, 0.3), (0.3, 0.2), ([0.2, 0.5], [0.1, 0.6]), ([0.1, 0.6], [0.2, 0.5])],
)
def test_ellipord_matches_scipy(wp, ws):
    n1, w1 = ellipord(wp, ws, 3, 60)
    n2, w2 = ss.ellipord(wp, ws, 3, 60)
    assert n1 == n2
    np.testing.assert_allclose(w1, w2, rtol=1e-4)  # fminbound-vs-golden tolerance


def test_ellipord_fs_units():
    n1, w1 = ellipord(30, 50, 1, 40, fs=200)
    n2, w2 = ss.ellipord(30, 50, 1, 40, fs=200)
    assert n1 == n2
    np.testing.assert_allclose(w1, w2, rtol=1e-9)


# ── bessel ───────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("norm", ["phase", "delay", "mag"])
@pytest.mark.parametrize("order", [1, 2, 5, 8])
def test_bessel_norms_match_scipy(norm, order):
    ours = bessel(order, 0.25, norm=norm)
    ref = ss.bessel(order, 0.25, norm=norm)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-7, atol=1e-10 * np.abs(r).max())


@pytest.mark.parametrize("btype,Wn", BTYPES)
def test_bessel_band_types_match_scipy(btype, Wn):
    ours = bessel(4, Wn, btype=btype)
    ref = ss.bessel(4, Wn, btype=btype)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-7, atol=1e-10 * np.abs(r).max())


def test_bessel_high_order_poles_stay_accurate():
    # n=12: raw reversed-Bessel coefficients span ~(2n)! — the phase-scaled
    # companion matrix + Newton polish must hold ~1e-11 anyway.
    ours = bessel(12, 0.4, btype="high")
    ref = ss.bessel(12, 0.4, btype="high")
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-6, atol=1e-9 * np.abs(r).max())


def test_bessel_flat_group_delay():
    # Defining property: delay-normalized analog prototype has group delay
    # ≈ 1 s across the passband (maximally flat at DC).
    b, a = bessel(6, 1.0, analog=True, norm="delay")
    w, h = ss.freqs(b, a, worN=np.linspace(0.01, 0.8, 64))
    gd = -np.gradient(np.unwrap(np.angle(h)), w)
    np.testing.assert_allclose(gd, 1.0, atol=2e-3)


# ── iircomb ──────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("ftype", ["notch", "peak"])
@pytest.mark.parametrize("pass_zero", [False, True])
def test_iircomb_matches_scipy(ftype, pass_zero):
    ours = iircomb(50, 30, ftype=ftype, fs=1000, pass_zero=pass_zero)
    ref = ss.iircomb(50, 30, ftype=ftype, fs=1000, pass_zero=pass_zero)
    for o, r in zip(ours, ref):
        np.testing.assert_allclose(o, r, rtol=1e-12, atol=1e-15)


def test_iircomb_notch_kills_harmonics():
    b, a = iircomb(100, 35, fs=1000)
    for f in (100, 200, 300, 400):
        _, h = ss.freqz(b, a, worN=[2 * np.pi * f / 1000])
        assert np.abs(h[0]) < 1e-10, f"harmonic {f} Hz not notched"


def test_iircomb_validates():
    with pytest.raises(ValueError):
        iircomb(33.3, 30, fs=1000)  # non-integer tooth count
    with pytest.raises(ValueError):
        iircomb(600, 30, fs=1000)  # beyond Nyquist
    with pytest.raises(ValueError):
        iircomb(50, 30, ftype="bogus", fs=1000)


# ── facade wiring ────────────────────────────────────────────────────────────


def test_new_designs_reachable_from_namespaces():
    import gpu_fft_tpu
    import gpu_fft_tpu.signal as sig

    for mod in (gpu_fft_tpu, sig):
        for name in ("ellip", "ellipord", "bessel", "iircomb"):
            assert callable(getattr(mod, name)), f"{mod.__name__}.{name}"


# ── prototype / transform aliases + analog response (scipy names) ────────────


def test_prototype_aliases_match_scipy():
    from gpu_fft_tpu.ops.design import besselap, buttap, cheb1ap, cheb2ap, ellipap

    pairs = [
        (buttap(5), ss.buttap(5)),
        (cheb1ap(5, 1), ss.cheb1ap(5, 1)),
        (cheb2ap(5, 40), ss.cheb2ap(5, 40)),
        (ellipap(5, 1, 40), ss.ellipap(5, 1, 40)),
        (besselap(5), ss.besselap(5)),
    ]
    for (z1, p1, k1), (z2, p2, k2) in pairs:
        np.testing.assert_allclose(np.sort_complex(np.atleast_1d(p1)),
                                   np.sort_complex(np.atleast_1d(p2)), rtol=1e-7, atol=1e-12)
        np.testing.assert_allclose(k1, k2, rtol=1e-7)


def test_lp2_transforms_match_scipy():
    from gpu_fft_tpu.ops.design import (
        lp2bp, lp2bp_zpk, lp2bs, lp2bs_zpk, lp2hp, lp2hp_zpk, lp2lp, lp2lp_zpk,
    )

    z, p, k = ss.buttap(4)
    for ours, ref in [(lp2lp_zpk, ss.lp2lp_zpk), (lp2hp_zpk, ss.lp2hp_zpk)]:
        o, r = ours(z, p, k, 2.0), ref(z, p, k, 2.0)
        np.testing.assert_allclose(np.sort_complex(np.atleast_1d(o[1])),
                                   np.sort_complex(np.atleast_1d(r[1])), rtol=1e-12)
    for ours, ref in [(lp2bp_zpk, ss.lp2bp_zpk), (lp2bs_zpk, ss.lp2bs_zpk)]:
        o, r = ours(z, p, k, 2.0, 0.5), ref(z, p, k, 2.0, 0.5)
        np.testing.assert_allclose(np.sort_complex(np.atleast_1d(o[1])),
                                   np.sort_complex(np.atleast_1d(r[1])), rtol=1e-12)
    b, a = ss.butter(4, 1.0, analog=True)
    for ours, ref in [(lp2lp, ss.lp2lp), (lp2hp, ss.lp2hp)]:
        for o, r in zip(ours(b, a, 2.0), ref(b, a, 2.0)):
            np.testing.assert_allclose(o, r, rtol=1e-9)
    for ours, ref in [(lp2bp, ss.lp2bp), (lp2bs, ss.lp2bs)]:
        for o, r in zip(ours(b, a, 2.0, 0.5), ref(b, a, 2.0, 0.5)):
            np.testing.assert_allclose(o, r, rtol=1e-8, atol=1e-12 * np.abs(r).max())


def test_bilinear_zpk_matches_scipy():
    from gpu_fft_tpu.ops.design import bilinear_zpk

    z, p, k = ss.cheb1ap(5, 1)
    o = bilinear_zpk(z, p, k, 10.0)
    r = ss.bilinear_zpk(z, p, k, 10.0)
    np.testing.assert_allclose(np.sort_complex(np.atleast_1d(o[1])),
                               np.sort_complex(np.atleast_1d(r[1])), rtol=1e-12)
    np.testing.assert_allclose(o[2], r[2], rtol=1e-12)


def test_freqs_family_matches_scipy():
    from gpu_fft_tpu.ops.design import findfreqs, freqs, freqs_zpk

    b, a = ss.butter(4, 1.0, analog=True)
    w1, h1 = freqs(b, a)
    w2, h2 = ss.freqs(b, a)
    np.testing.assert_allclose(w1, w2, rtol=1e-12)
    np.testing.assert_allclose(h1, h2, rtol=1e-10)
    z, p, k = ss.buttap(4)
    grid = np.logspace(-1, 1, 64)
    np.testing.assert_allclose(freqs_zpk(z, p, k, worN=grid)[1],
                               ss.freqs_zpk(z, p, k, worN=grid)[1], rtol=1e-10)
    np.testing.assert_allclose(findfreqs([1, 0], [1, 8, 25], 15),
                               ss.findfreqs([1, 0], [1, 8, 25], 15), rtol=1e-12)


@pytest.mark.parametrize("ftype", ["butter", "cheby1", "cheby2", "ellip"])
def test_iirdesign_matches_scipy(ftype):
    from gpu_fft_tpu.ops.design import iirdesign

    for wp, ws in [(0.2, 0.3), (0.3, 0.2), ([0.2, 0.5], [0.1, 0.6])]:
        o = iirdesign(wp, ws, 1, 40, ftype=ftype)
        r = ss.iirdesign(wp, ws, 1, 40, ftype=ftype)
        np.testing.assert_allclose(o[0], r[0], rtol=1e-5, atol=1e-8 * np.abs(r[0]).max())
        np.testing.assert_allclose(o[1], r[1], rtol=1e-6)


def test_iirdesign_rejects_unknown_family():
    from gpu_fft_tpu.ops.design import iirdesign

    with pytest.raises(ValueError, match="butter"):
        iirdesign(0.2, 0.3, 1, 40, ftype="bogus")
