"""Filter representation conversions and response analysis vs scipy.

tf2zpk/tf2sos/sos2tf/sos2zpk/normalize: conversions are value-exact (root
sets compared as multisets, polynomials coefficient-wise) or response-exact
where section pairing may legitimately differ (tf2sos).  group_delay and
sosfreqz ride the device transform on DFT-bin grids, so they are compared
against scipy evaluated on the SAME grid.  freqz_zpk and czt_points are
host f64 — element-wise exact.

Extension beyond the reference surface (the reference has no filter-design
layer); the response-analysis grid convention matches ``ops/filter.py``'s
freqz (reference analog: the PSD/utils layer, ``src/utils.rs``).
"""

from __future__ import annotations

import numpy as np
import pytest
import scipy.signal as ss

import gpu_fft_tpu as gf


def _sorted_roots(r):
    r = np.asarray(r, dtype=complex)
    return np.array(sorted(r, key=lambda v: (round(v.real, 9), round(v.imag, 9))))


def assert_rootsets_close(got, want, tol=1e-9, label=""):
    got, want = _sorted_roots(got), _sorted_roots(want)
    assert got.shape == want.shape, f"{label}: {got.shape} vs {want.shape}"
    np.testing.assert_allclose(got, want, rtol=0, atol=tol, err_msg=label)


class TestTf2Zpk:
    def test_butter_roundtrip_vs_scipy(self):
        b, a = gf.butter(5, 0.3)
        z, p, k = gf.tf2zpk(b, a)
        zs, ps, ks = ss.tf2zpk(b, a)
        assert_rootsets_close(z, zs, 1e-8, "zeros")
        assert_rootsets_close(p, ps, 1e-8, "poles")
        assert abs(k - ks) < 1e-12

    def test_fir_numerator_only(self):
        b = np.array([1.0, -0.5, 0.25])
        z, p, k = gf.tf2zpk(b, [2.0])
        zs, ps, ks = ss.tf2zpk(b, [2.0])
        assert_rootsets_close(z, zs, 1e-12)
        assert p.size == ps.size == 0
        assert abs(k - ks) < 1e-12

    def test_leading_zero_numerator_trimmed(self):
        b = np.array([0.0, 1.0, 0.3])
        z, p, k = gf.tf2zpk(b, [1.0, -0.2])
        zs, ps, ks = ss.tf2zpk(b, [1.0, -0.2])
        assert_rootsets_close(z, zs, 1e-12)
        assert_rootsets_close(p, ps, 1e-12)
        assert abs(k - ks) < 1e-12

    def test_all_zero_numerator_raises(self):
        with pytest.raises(ValueError):
            gf.tf2zpk([0.0, 0.0], [1.0, 0.5])

    def test_zero_leading_denominator_raises(self):
        with pytest.raises(ValueError):
            gf.tf2zpk([1.0], [0.0, 1.0])


class TestNormalize:
    def test_scales_by_a0(self):
        b, a = gf.normalize([2.0, 4.0], [2.0, 1.0])
        bs, as_ = ss.normalize([2.0, 4.0], [2.0, 1.0])
        np.testing.assert_allclose(b, bs, atol=1e-15)
        np.testing.assert_allclose(a, as_, atol=1e-15)

    def test_2d_numerator(self):
        b = np.array([[1.0, 2.0], [3.0, 4.0]])
        bn, an = gf.normalize(b, [2.0, 0.5])
        bs, as_ = ss.normalize(b, [2.0, 0.5])
        np.testing.assert_allclose(bn, bs, atol=1e-15)
        np.testing.assert_allclose(an, as_, atol=1e-15)


class TestSosConversions:
    @pytest.mark.parametrize("order,wn,btype", [(4, 0.3, "low"), (5, [0.2, 0.6], "bandpass")])
    def test_sos2tf_vs_scipy(self, order, wn, btype):
        sos = gf.butter(order, wn, btype=btype, output="sos")
        b, a = gf.sos2tf(sos)
        bs, as_ = ss.sos2tf(sos)
        np.testing.assert_allclose(b, bs, rtol=0, atol=1e-12)
        np.testing.assert_allclose(a, as_, rtol=0, atol=1e-12)

    def test_sos2zpk_vs_scipy(self):
        sos = gf.cheby1(6, 0.5, 0.4, output="sos")
        z, p, k = gf.sos2zpk(sos)
        zs, ps, ks = ss.sos2zpk(sos)
        assert_rootsets_close(z, zs, 1e-9, "zeros")
        assert_rootsets_close(p, ps, 1e-9, "poles")
        assert abs(k - ks) < 1e-12 * max(1.0, abs(ks))

    def test_sos2zpk_pads_origin_for_degenerate_sections(self):
        sos = np.array([[1.0, 0.5, 0.0, 1.0, -0.3, 0.0]])  # linear section
        z, p, k = gf.sos2zpk(sos)
        zs, ps, ks = ss.sos2zpk(sos)
        assert_rootsets_close(z, zs, 1e-12)
        assert_rootsets_close(p, ps, 1e-12)
        assert z.shape == (2,) and p.shape == (2,)

    def test_tf2sos_response_matches(self):
        b, a = gf.butter(6, 0.35)
        sos = gf.tf2sos(b, a)
        w = np.linspace(1e-3, np.pi - 1e-3, 256)
        _, h_tf = ss.freqz(b, a, worN=w)
        _, h_sos = ss.sosfreqz(sos, worN=w)
        np.testing.assert_allclose(h_sos, h_tf, rtol=0, atol=1e-8)

    def test_roundtrip_zpk_sos_zpk(self):
        z0, p0, k0 = gf.butter(4, 0.3, output="zpk")
        z1, p1, k1 = gf.sos2zpk(gf.zpk2sos(z0, p0, k0))
        assert_rootsets_close(np.sort_complex(z1), np.sort_complex(z0), 1e-9)
        assert_rootsets_close(np.sort_complex(p1), np.sort_complex(p0), 1e-9)
        assert abs(k1 - k0) < 1e-12 * max(1.0, abs(k0))


class TestGroupDelay:
    @pytest.mark.parametrize("whole", [False, True])
    def test_iir_vs_scipy_same_grid(self, whole):
        b, a = gf.butter(4, 0.3)
        w, gd = gf.group_delay((b, a), 512, whole=whole)
        ws, gds = ss.group_delay((b, a), w=512, whole=whole)
        np.testing.assert_allclose(w, ws, atol=1e-12)
        # Group delay is undefined at exact response nulls (w=pi here, a
        # 4th-order numerator zero): scipy returns 0/eps rounding noise
        # there, this library returns 0 — compare away from nulls.
        _, h = ss.freqz(b, a, worN=w)
        ok = np.abs(h) > 1e-14
        assert ok.sum() >= len(w) - 2
        np.testing.assert_allclose(gd[ok], gds[ok], rtol=0, atol=5e-3)

    def test_linear_phase_fir_is_constant(self):
        h = gf.firwin(33, 0.4)
        w, gd = gf.group_delay((h, 1.0), 256)
        np.testing.assert_allclose(gd, 16.0, rtol=0, atol=2e-3)

    def test_fs_scaling(self):
        b, a = gf.cheby1(3, 1.0, 0.25)
        w, gd = gf.group_delay((b, a), 128, fs=1000.0)
        ws, gds = ss.group_delay((b, a), w=128, fs=1000.0)
        np.testing.assert_allclose(w, ws, atol=1e-9)
        np.testing.assert_allclose(gd, gds, rtol=0, atol=5e-3)


class TestSosfreqz:
    @pytest.mark.parametrize("whole", [False, True])
    def test_vs_scipy(self, whole):
        sos = gf.cheby2(7, 40.0, 0.4, output="sos")
        w, hr, hi = gf.sosfreqz(sos, worN=512, whole=whole)
        ws, hs = ss.sosfreqz(sos, worN=512, whole=whole)
        np.testing.assert_allclose(w, ws, atol=1e-12)
        scale = np.abs(hs).max()
        np.testing.assert_allclose(hr + 1j * hi, hs, rtol=0, atol=2e-5 * scale)

    def test_signal_facade_complex(self):
        import gpu_fft_tpu.signal as gsig

        sos = gf.butter(4, 0.3, output="sos")
        w, h = gsig.sosfreqz(sos, worN=128)
        ws, hs = ss.sosfreqz(sos, worN=128)
        np.testing.assert_allclose(h, hs, rtol=0, atol=2e-5)


class TestFreqzZpk:
    @pytest.mark.parametrize("whole", [False, True])
    def test_vs_scipy(self, whole):
        z, p, k = gf.butter(5, 0.35, output="zpk")
        w, hr, hi = gf.freqz_zpk(z, p, k, worN=256, whole=whole)
        ws, hs = ss.freqz_zpk(z, p, k, worN=256, whole=whole)
        np.testing.assert_allclose(w, ws, atol=1e-12)
        np.testing.assert_allclose(hr + 1j * hi, hs, rtol=0, atol=1e-10)

    def test_fs_grid(self):
        z, p, k = gf.cheby1(4, 0.5, 0.3, output="zpk")
        w, hr, hi = gf.freqz_zpk(z, p, k, worN=100, fs=8000.0)
        ws, hs = ss.freqz_zpk(z, p, k, worN=100, fs=8000.0)
        np.testing.assert_allclose(w, ws, atol=1e-9)
        np.testing.assert_allclose(hr + 1j * hi, hs, rtol=0, atol=1e-10)


class TestCztPoints:
    def test_default_unit_circle(self):
        np.testing.assert_allclose(gf.czt_points(16), ss.czt_points(16), atol=1e-12)

    def test_spiral(self):
        w = 0.998 * np.exp(-2j * np.pi / 50)
        a = 0.5 * np.exp(1j * 0.3)
        np.testing.assert_allclose(
            gf.czt_points(64, w, a), ss.czt_points(64, w, a), rtol=1e-10, atol=1e-12
        )

    def test_matches_czt_evaluation(self):
        # czt(x) must equal the naive z-transform at czt_points.
        rng = np.random.default_rng(3)
        x = rng.standard_normal(32).astype(np.float32)
        pts = gf.czt_points(20, np.exp(-2j * np.pi / 40), np.exp(1j * 0.1))
        yr, yi = gf.czt(x, m=20, w=np.exp(-2j * np.pi / 40), a=np.exp(1j * 0.1))
        naive = np.array([np.sum(x * pt ** -np.arange(32)) for pt in pts])
        np.testing.assert_allclose(yr + 1j * yi, naive, rtol=0, atol=5e-4 * np.abs(naive).max())
