"""Oracle tests for the final scipy.signal top-level completion wave:
envelope, find_peaks_cwt, closest_STFT_dual_window, firwin_2d,
band_stop_obj, freqz_sos, BadCoefficients.

Each function is checked element-wise against scipy.signal 1.17 on the
same inputs (host/f64 design code is exact; engine-backed paths get FFT
tolerances).  No counterpart in the reference — pure scipy-parity
extension on top of the engine (SURVEY §2 extension surface).
"""

import numpy as np
import pytest
import scipy.signal as ss

import gpu_fft_tpu.signal as gs
from gpu_fft_tpu.ops.dsp import envelope_scipy


# ---------------------------------------------------------------- envelope
class TestEnvelope:
    def _sig(self, n=300, seed=0):
        rng = np.random.default_rng(seed)
        t = np.arange(n) / n
        return (np.sin(2 * np.pi * 30 * t) * (1 + 0.5 * np.cos(2 * np.pi * 3 * t))
                + 0.1 * rng.standard_normal(n))

    @pytest.mark.parametrize("bp_in", [(1, None), (5, 60), (None, None), (10, None)])
    @pytest.mark.parametrize("squared", [False, True])
    def test_real_matches_scipy(self, bp_in, squared):
        x = self._sig()
        ours = envelope_scipy(x, bp_in, squared=squared)
        ref = ss.envelope(x, bp_in, squared=squared)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("residual", ["lowpass", "all", None])
    def test_residual_modes(self, residual):
        x = self._sig(256, 1)
        ours = envelope_scipy(x, (8, 50), residual=residual)
        ref = ss.envelope(x, (8, 50), residual=residual)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)

    @pytest.mark.parametrize("n_out", [128, 300, 512])
    def test_n_out_resampling(self, n_out):
        x = self._sig(256, 2)
        ours = envelope_scipy(x, (4, 40), n_out=n_out)
        ref = ss.envelope(x, (4, 40), n_out=n_out)
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)

    @pytest.mark.parametrize("bp_in", [(-20, 20), (2, 40)])
    @pytest.mark.parametrize("n_out", [None, 128])
    def test_complex_input(self, bp_in, n_out):
        rng = np.random.default_rng(3)
        z = rng.standard_normal(200) + 1j * rng.standard_normal(200)
        ours = envelope_scipy(z, bp_in, n_out=n_out)
        ref = ss.envelope(z, bp_in, n_out=n_out)
        np.testing.assert_allclose(ours, ref, atol=3e-4, rtol=1e-3)

    def test_axis_and_batch(self):
        x = np.stack([self._sig(128, s) for s in range(3)])  # (3, 128)
        ours = envelope_scipy(x, (2, 30), axis=-1)
        ref = ss.envelope(x, (2, 30), axis=-1)
        np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)
        oursT = envelope_scipy(x.T, (2, 30), axis=0)
        np.testing.assert_allclose(oursT, np.moveaxis(ours, -1, 1), atol=1e-6)

    def test_signal_namespace_and_errors(self):
        assert gs.envelope is envelope_scipy
        x = self._sig(64)
        with pytest.raises(ValueError):
            envelope_scipy(x, (1, 2, 3))
        with pytest.raises(ValueError):
            envelope_scipy(x, (1, None), n_out=0)
        with pytest.raises(ValueError):
            envelope_scipy(x, (40, 10))
        with pytest.raises(ValueError):
            envelope_scipy(x, (1, None), residual="bandpass")


# ------------------------------------------------------------ find_peaks_cwt
class TestFindPeaksCwt:
    def test_gaussian_bumps_match_scipy(self):
        t = np.linspace(0, 10, 1000)
        x = (np.exp(-((t - 2) ** 2) / 0.02) + 1.4 * np.exp(-((t - 5) ** 2) / 0.05)
             + 0.9 * np.exp(-((t - 8) ** 2) / 0.01))
        widths = np.arange(1, 40)
        ours = gs.find_peaks_cwt(x, widths)
        ref = ss.find_peaks_cwt(x, widths)
        np.testing.assert_array_equal(ours, ref)

    def test_noisy_sine_matches_scipy(self):
        rng = np.random.default_rng(42)
        x = np.sin(2 * np.pi * np.arange(600) / 120.0) + 0.05 * rng.standard_normal(600)
        widths = np.arange(5, 60)
        ours = gs.find_peaks_cwt(x, widths)
        ref = ss.find_peaks_cwt(x, widths)
        np.testing.assert_array_equal(ours, ref)

    def test_min_snr_and_window(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(400)
        x[100] += 8.0
        x[300] += 8.0
        widths = np.arange(1, 20)
        ours = gs.find_peaks_cwt(x, widths, min_snr=2, window_size=31)
        ref = ss.find_peaks_cwt(x, widths, min_snr=2, window_size=31)
        np.testing.assert_array_equal(ours, ref)

    def test_scalar_width_and_empty(self):
        flat = np.zeros(100)
        assert gs.find_peaks_cwt(flat, np.arange(1, 10)).size == 0
        x = np.exp(-((np.arange(200) - 100.0) ** 2) / 50.0)
        ours = gs.find_peaks_cwt(x, [8])
        ref = ss.find_peaks_cwt(x, [8])
        np.testing.assert_array_equal(ours, ref)


# --------------------------------------------------- closest_STFT_dual_window
class TestClosestSTFTDualWindow:
    @pytest.mark.parametrize("m,hop", [(24, 8), (33, 11), (64, 16), (16, 16)])
    def test_matches_scipy(self, m, hop):
        win = ss.get_window("hann", m) + 0.05
        desired = ss.get_window("hamming", m)
        w_ours, a_ours = gs.closest_STFT_dual_window(win, hop, desired)
        w_ref, a_ref = ss.closest_STFT_dual_window(win, hop, desired)
        np.testing.assert_allclose(w_ours, w_ref, atol=1e-12)
        np.testing.assert_allclose(a_ours, a_ref, atol=1e-12)

    def test_unscaled_and_default_desired(self):
        win = ss.get_window(("kaiser", 8.0), 40)
        w_ours, a_ours = gs.closest_STFT_dual_window(win, 10, scaled=False)
        w_ref, a_ref = ss.closest_STFT_dual_window(win, 10, scaled=False)
        assert a_ours == a_ref == 1.0
        np.testing.assert_allclose(w_ours, w_ref, atol=1e-12)

    def test_result_is_a_dual_window(self):
        # WOLA duality: sum_k conj(win[n+kh]) * dual[n+kh] == 1/hop... scipy's
        # criterion: ShortTimeFFT with (win, hop) inverts using the dual.
        win = ss.get_window("hann", 32) + 0.02
        dual, _ = gs.closest_STFT_dual_window(win, 8, ss.get_window("boxcar", 32))
        stf = ss.ShortTimeFFT(win, 8, fs=1.0, dual_win=dual)
        rng = np.random.default_rng(0)
        x = rng.standard_normal(160)
        np.testing.assert_allclose(stf.istft(stf.stft(x), k1=x.size), x, atol=1e-10)

    def test_errors(self):
        win = np.ones(16)
        with pytest.raises(ValueError):
            gs.closest_STFT_dual_window(win, 0)
        with pytest.raises(ValueError):
            gs.closest_STFT_dual_window(win, 4, np.ones(8))
        with pytest.raises(ValueError):
            gs.closest_STFT_dual_window(win * np.nan, 4)


# ------------------------------------------------------------------ firwin_2d
class TestFirwin2d:
    def test_separable_matches_scipy(self):
        ours = gs.firwin_2d((15, 21), ("hamming", "hann"), fc=0.3)
        ref = ss.firwin_2d((15, 21), ("hamming", "hann"), fc=0.3)
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_circular_matches_scipy(self):
        ours = gs.firwin_2d((17, 17), "hamming", fc=0.4, circular=True)
        ref = ss.firwin_2d((17, 17), "hamming", fc=0.4, circular=True)
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_highpass_and_fs(self):
        ours = gs.firwin_2d((9, 9), ("hann", "hann"), fc=100.0, fs=1000.0,
                            pass_zero=False)
        ref = ss.firwin_2d((9, 9), ("hann", "hann"), fc=100.0, fs=1000.0,
                           pass_zero=False)
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    def test_errors(self):
        with pytest.raises(ValueError):
            gs.firwin_2d((9,), "hamming", fc=0.3)
        with pytest.raises(ValueError):
            gs.firwin_2d((9, 9), "hamming", fc=0.3)  # window must be 2-elem
        with pytest.raises(ValueError):
            gs.firwin_2d((9, 9), ("hann", "hann"))  # fc required
        with pytest.raises(ValueError):
            gs.firwin_2d((9, 9), "hamming", circular=True)  # fc required


# -------------------------------------------------------------- band_stop_obj
class TestBandStopObj:
    @pytest.mark.parametrize("ftype", ["butter", "cheby", "ellip"])
    @pytest.mark.parametrize("ind", [0, 1])
    def test_matches_scipy(self, ftype, ind):
        passb = np.array([0.2, 0.5]) * np.pi
        stopb = np.array([0.3, 0.4]) * np.pi
        wp = passb[ind] * (1.02 if ind == 0 else 0.98)
        ours = gs.band_stop_obj(wp, ind, passb, stopb, 1.0, 30.0, ftype)
        ref = ss.band_stop_obj(wp, ind, passb, stopb, 1.0, 30.0, ftype)
        np.testing.assert_allclose(ours, ref, rtol=1e-9)

    def test_bad_type(self):
        with pytest.raises(ValueError):
            gs.band_stop_obj(0.3, 0, np.array([0.2, 0.5]), np.array([0.3, 0.4]),
                             1.0, 30.0, "bogus")


# ------------------------------------------------- freqz_sos / BadCoefficients
class TestFreqzSosAndNormalize:
    def test_freqz_sos_matches_sosfreqz(self):
        sos = ss.butter(6, 0.3, output="sos")
        w1, h1 = gs.freqz_sos(sos, worN=257)
        w2, h2 = ss.freqz_sos(sos, worN=257)
        np.testing.assert_allclose(w1, w2, atol=1e-12)
        np.testing.assert_allclose(h1, h2, atol=1e-5, rtol=1e-4)

    def test_native_namespace_complex(self):
        import gpu_fft_tpu as g

        sos = ss.butter(4, 0.2, output="sos")
        w, h = g.freqz_sos(sos, worN=128)
        assert np.iscomplexobj(h)

    def test_bad_coefficients_warning(self):
        with pytest.warns(gs.BadCoefficients):
            gs.normalize([0.0, 0.0, 1e-14], [1.0, 0.5])
        assert issubclass(gs.BadCoefficients, UserWarning)
        with pytest.warns(ss.BadCoefficients):
            ss.normalize([0.0, 0.0, 1e-14], [1.0, 0.5])
