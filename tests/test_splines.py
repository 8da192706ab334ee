"""Oracle tests for the spline/symiir family vs scipy.signal.

symiirorder1/2 initial conditions were pinned empirically against
scipy.signal._spline (weight tables via unit-impulse probing); here the
public functions are compared end-to-end.  The recursions run through the
f32 device block-state IIR engine, so tolerances are f32-scale (~1e-5
relative) rather than f64-exact.
"""

import numpy as np
import pytest
import scipy.signal as ss

import gpu_fft_tpu.signal as gs


@pytest.fixture
def rng():
    return np.random.default_rng(42)


class TestSymiirorder1:
    @pytest.mark.parametrize("z1,n", [(-2 + np.sqrt(3), 32), (-2 + np.sqrt(3), 200),
                                      (0.5, 200), (-0.4, 64)])
    def test_matches_scipy_1d(self, rng, z1, n):
        x = rng.standard_normal(n)
        c0 = -z1 * 6.0
        ours = gs.symiirorder1(x, c0, z1)
        ref = ss.symiirorder1(x, c0, z1)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def test_raise_parity_short_signal(self, rng):
        # |z1|=0.5 needs ~37 terms at the f64 default precision; scipy
        # raises on a 32-sample signal and so do we
        x = rng.standard_normal(32)
        with pytest.raises(ValueError):
            ss.symiirorder1(x, -3.0, 0.5)
        with pytest.raises(ValueError):
            gs.symiirorder1(x, -3.0, 0.5)

    def test_batched_2d(self, rng):
        x = rng.standard_normal((5, 80))
        z1 = -2 + np.sqrt(3)
        ours = gs.symiirorder1(x, 1.0, z1)
        ref = ss.symiirorder1(x, 1.0, z1)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-5)

    def test_errors(self, rng):
        with pytest.raises(ValueError):
            gs.symiirorder1(rng.standard_normal(16), 1.0, 1.5)  # |z1| >= 1
        with pytest.raises(ValueError):
            gs.symiirorder1(rng.standard_normal((2, 2, 8)), 1.0, 0.5)
        with pytest.raises(ValueError):
            # precision unreachable before the signal ends
            gs.symiirorder1(rng.standard_normal(4), 1.0, 0.9, precision=1e-12)


class TestSymiirorder2:
    @pytest.mark.parametrize("r,omega", [(0.5, 0.8), (0.3, 1.2), (0.7, 0.4)])
    def test_matches_scipy_1d(self, rng, r, omega):
        x = rng.standard_normal(150)
        ours = gs.symiirorder2(x, r, omega)
        ref = ss.symiirorder2(x, r, omega)
        np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)

    def test_batched_2d(self, rng):
        x = rng.standard_normal((4, 120))
        ours = gs.symiirorder2(x, 0.5, 0.9)
        ref = ss.symiirorder2(x, 0.5, 0.9)
        np.testing.assert_allclose(ours, ref, rtol=3e-5, atol=3e-5)

    def test_r_validation(self, rng):
        with pytest.raises(ValueError):
            gs.symiirorder2(rng.standard_normal(32), 1.2, 0.5)


class TestSpline1d:
    @pytest.mark.parametrize("n", [1, 2, 16, 100])
    def test_cspline1d(self, rng, n):
        x = rng.standard_normal(n)
        np.testing.assert_allclose(gs.cspline1d(x), ss.cspline1d(x),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("lamb", [1.0, 5.0, 20.0])
    def test_cspline1d_smoothing(self, rng, lamb):
        x = rng.standard_normal(120)
        np.testing.assert_allclose(gs.cspline1d(x, lamb), ss.cspline1d(x, lamb),
                                   rtol=3e-5, atol=3e-5)

    @pytest.mark.parametrize("n", [1, 2, 16, 100])
    def test_qspline1d(self, rng, n):
        x = rng.standard_normal(n)
        np.testing.assert_allclose(gs.qspline1d(x), ss.qspline1d(x),
                                   rtol=2e-5, atol=2e-5)

    def test_qspline1d_no_smoothing(self, rng):
        with pytest.raises(ValueError):
            gs.qspline1d(rng.standard_normal(16), 2.0)

    def test_eval_roundtrip_and_oracle(self, rng):
        x = rng.standard_normal(40)
        cj = ss.cspline1d(x)  # same coefficients into both evals
        newx = np.linspace(-5.0, 45.0, 173)  # crosses both mirror boundaries
        np.testing.assert_allclose(gs.cspline1d_eval(cj, newx),
                                   ss.cspline1d_eval(cj, newx), atol=1e-10)
        # knot values reproduce the signal
        np.testing.assert_allclose(
            gs.cspline1d_eval(np.asarray(gs.cspline1d(x)), np.arange(40.0)),
            x, atol=1e-4)

    def test_qspline_eval(self, rng):
        x = rng.standard_normal(30)
        cj = ss.qspline1d(x)
        newx = np.linspace(-4.0, 33.0, 131)
        np.testing.assert_allclose(gs.qspline1d_eval(cj, newx),
                                   ss.qspline1d_eval(cj, newx), atol=1e-10)

    def test_eval_dx_x0_and_empty(self):
        cj = ss.cspline1d(np.sin(np.arange(20.0)))
        newx = np.linspace(2.0, 8.0, 33)
        np.testing.assert_allclose(gs.cspline1d_eval(cj, newx, dx=0.5, x0=1.0),
                                   ss.cspline1d_eval(cj, newx, dx=0.5, x0=1.0),
                                   atol=1e-10)
        assert gs.cspline1d_eval(cj, np.array([])).size == 0
        with pytest.raises(ValueError):
            gs.cspline1d_eval(np.array([]), newx)


class TestSpline2d:
    @pytest.mark.parametrize("lamb,shape", [(0.0, (24, 31)), (1.0, (24, 31)),
                                            (8.0, (48, 64))])
    def test_cspline2d(self, rng, lamb, shape):
        img = rng.standard_normal(shape)
        ours = gs.cspline2d(img, lamb)
        ref = ss.cspline2d(img, lamb)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_cspline2d_raise_parity_nonconvergent(self, rng):
        # at lamb=8 the f64 boundary sum needs more terms than a 24-wide
        # image provides; scipy raises and so do we
        img = rng.standard_normal((24, 31))
        with pytest.raises(ValueError):
            ss.cspline2d(img, 8.0)
        with pytest.raises(ValueError):
            gs.cspline2d(img, 8.0)

    def test_qspline2d(self, rng):
        img = rng.standard_normal((20, 26))
        np.testing.assert_allclose(gs.qspline2d(img), ss.qspline2d(img),
                                   rtol=1e-4, atol=1e-4)

    def test_qspline2d_lamb_error(self, rng):
        with pytest.raises(ValueError):
            gs.qspline2d(rng.standard_normal((8, 8)), 1.0)


class TestSepfir2dAndFilter:
    def test_sepfir2d_matches(self, rng):
        img = rng.standard_normal((16, 21))
        hrow = rng.standard_normal(5)
        hcol = rng.standard_normal(3)
        np.testing.assert_allclose(gs.sepfir2d(img, hrow, hcol),
                                   ss.sepfir2d(img, hrow, hcol), atol=1e-10)

    def test_sepfir2d_errors(self, rng):
        img = rng.standard_normal((8, 8))
        with pytest.raises(ValueError):
            gs.sepfir2d(img, np.ones(2), np.ones(3))
        with pytest.raises(ValueError):
            gs.sepfir2d(np.ones(8), np.ones(3), np.ones(3))

    @pytest.mark.parametrize("lmbda", [5.0, 10.0])
    def test_spline_filter(self, rng, lmbda):
        # f64 boundary sums need ~wide images to converge (scipy raises on
        # 20x20 here too); 64x64 is inside both domains
        img = rng.standard_normal((64, 64)).astype(np.float64)
        ours = gs.spline_filter(img, lmbda)
        ref = ss.spline_filter(img, lmbda)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_spline_filter_f32_and_complex(self, rng):
        img32 = rng.standard_normal((16, 16)).astype(np.float32)
        np.testing.assert_allclose(gs.spline_filter(img32),
                                   ss.spline_filter(img32), rtol=1e-3, atol=1e-3)
        # modern scipy's smoothing path rejects complex input outright; we
        # keep the historic single-precision behavior — the filter is
        # real-linear, so oracle via scipy on the real/imag parts
        imgc = (rng.standard_normal((16, 16))
                + 1j * rng.standard_normal((16, 16))).astype(np.complex64)
        ours = gs.spline_filter(imgc)
        ref = (ss.spline_filter(imgc.real.copy())
               + 1j * ss.spline_filter(imgc.imag.copy())).astype(np.complex64)
        assert ours.dtype == np.complex64
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-3)
        with pytest.raises(TypeError):
            gs.spline_filter(np.ones((4, 4), dtype=np.int32))


class TestNativeNamespace:
    def test_top_level_exports(self):
        import gpu_fft_tpu as gf

        for name in ("cspline1d", "qspline2d", "sepfir2d", "symiirorder1",
                     "symiirorder2", "spline_filter"):
            assert hasattr(gf, name)

    def test_full_scipy_signal_parity(self):
        """Every public scipy.signal symbol now has a counterpart."""
        import scipy.signal as ssig

        missing = [s for s in ssig.__all__
                   if not s.startswith("_") and not hasattr(gs, s)]
        assert missing == []
