"""Oracle tests: gpu_fft_tpu.signal.windows vs scipy.signal.windows.

Every window family, symmetric and periodic forms, odd and even lengths,
element-wise in f64 — plus the get_window dispatch table (aliases, tuples,
bare-float kaiser, _symmetric/_periodic suffixes) and the estimator-side
window_table fallback that the new module unlocks.
"""

import numpy as np
import pytest
import scipy.signal as ss
import scipy.signal.windows as sw

from gpu_fft_tpu.signal import windows as w

NO_ARG = ["boxcar", "triang", "parzen", "bohman", "blackman", "nuttall",
          "blackmanharris", "flattop", "bartlett", "barthann", "hamming",
          "hann", "cosine", "lanczos"]

PARAM = [
    ("kaiser", (8.6,)),
    ("kaiser", (0.0,)),
    ("gaussian", (7.0,)),
    ("general_gaussian", (1.5, 5.0)),
    ("general_hamming", (0.7,)),
    ("general_cosine", ([0.4, 0.5, 0.1],)),
    ("chebwin", (100.0,)),
    ("chebwin", (60.0,)),
    ("tukey", (0.25,)),
    ("tukey", (0.5,)),
    ("tukey", (1.0,)),
    ("taylor", ()),
    ("taylor", (6, 50, False)),
    ("exponential", (None, 3.0)),
]


@pytest.mark.parametrize("name", NO_ARG)
@pytest.mark.parametrize("M", [8, 9, 32, 51])
@pytest.mark.parametrize("sym", [True, False])
def test_no_arg_windows_match(name, M, sym):
    ours = getattr(w, name)(M, sym=sym)
    ref = getattr(sw, name)(M, sym=sym)
    np.testing.assert_allclose(ours, ref, atol=1e-13, err_msg=f"{name} M={M}")


@pytest.mark.parametrize("name,args", PARAM)
@pytest.mark.parametrize("M", [16, 33])
@pytest.mark.parametrize("sym", [True, False])
def test_param_windows_match(name, args, M, sym):
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # chebwin <45 dB advisory
        ours = getattr(w, name)(M, *args, sym=sym)
        ref = getattr(sw, name)(M, *args, sym=sym)
    np.testing.assert_allclose(ours, ref, atol=1e-12, err_msg=f"{name}{args}")


@pytest.mark.parametrize("M", [16, 33, 64])
@pytest.mark.parametrize("sym", [True, False])
def test_exponential_center_periodic(M, sym):
    if sym:
        with pytest.raises(ValueError):
            w.exponential(M, center=2.0, sym=True)
    else:
        np.testing.assert_allclose(w.exponential(M, 2.0, 1.5, sym=False),
                                   sw.exponential(M, 2.0, 1.5, sym=False))


@pytest.mark.parametrize("M", [16, 32])
def test_kbd_matches(M):
    for beta in (4.0, 8.6):
        np.testing.assert_allclose(w.kaiser_bessel_derived(M, beta),
                                   sw.kaiser_bessel_derived(M, beta), atol=1e-14)
    with pytest.raises(ValueError):
        w.kaiser_bessel_derived(15, 4.0)
    with pytest.raises(ValueError):
        w.kaiser_bessel_derived(16, 4.0, sym=False)


class TestDpss:
    @pytest.mark.parametrize("M", [33, 64])
    @pytest.mark.parametrize("sym", [True, False])
    def test_singleton(self, M, sym):
        np.testing.assert_allclose(w.dpss(M, 3.0, sym=sym),
                                   sw.dpss(M, 3.0, sym=sym), atol=1e-10)

    @pytest.mark.parametrize("norm", [2, "approximate", "subsample"])
    def test_multitaper_and_norms(self, norm):
        ours = w.dpss(60, 2.5, Kmax=4, norm=norm)
        ref = sw.dpss(60, 2.5, Kmax=4, norm=norm)
        np.testing.assert_allclose(ours, ref, atol=1e-10)

    def test_return_ratios(self):
        ours, r_ours = w.dpss(48, 2.0, Kmax=3, return_ratios=True)
        ref, r_ref = sw.dpss(48, 2.0, Kmax=3, return_ratios=True)
        np.testing.assert_allclose(ours, ref, atol=1e-10)
        np.testing.assert_allclose(r_ours, r_ref, atol=1e-10)
        assert np.all(r_ours > 0.9)  # well-concentrated tapers

    def test_errors(self):
        with pytest.raises(ValueError):
            w.dpss(32, 20.0)  # NW >= M/2
        with pytest.raises(ValueError):
            w.dpss(32, -1.0)
        with pytest.raises(ValueError):
            w.dpss(32, 2.0, Kmax=0)
        with pytest.raises(ValueError):
            w.dpss(32, 2.0, norm="bogus")


class TestGetWindow:
    ALIASES = ["box", "rect", "ones", "tri", "bart", "black", "bkh", "nut",
               "flt", "ham", "han", "bth", "bman", "parz", "sinc",
               "halfcosine", "taylorwin"]

    @pytest.mark.parametrize("alias", ALIASES)
    def test_aliases(self, alias):
        np.testing.assert_allclose(w.get_window(alias, 24),
                                   ss.get_window(alias, 24), atol=1e-13)

    @pytest.mark.parametrize("win", [("kaiser", 8.6), ("gaussian", 5.0),
                                     ("tukey", 0.3), ("general_hamming", 0.6),
                                     ("chebwin", 80), ("dpss", 2.5),
                                     ("exponential", None, 2.0),
                                     ("general_cosine", [0.5, 0.5])])
    @pytest.mark.parametrize("fftbins", [True, False])
    def test_tuples(self, win, fftbins):
        np.testing.assert_allclose(w.get_window(win, 32, fftbins),
                                   ss.get_window(win, 32, fftbins), atol=1e-10)

    def test_poisson_alias_periodic_only(self):
        # periodic form works; the symmetric form with an explicit center
        # raises — in scipy too
        np.testing.assert_allclose(w.get_window(("poisson", 2.0), 32),
                                   ss.get_window(("poisson", 2.0), 32), atol=1e-14)
        with pytest.raises(ValueError):
            w.get_window(("poisson", 2.0), 32, fftbins=False)

    def test_float_is_kaiser_beta(self):
        np.testing.assert_allclose(w.get_window(6.0, 20),
                                   ss.get_window(6.0, 20), atol=1e-14)

    def test_suffix_overrides(self):
        np.testing.assert_allclose(w.get_window("hann_symmetric", 16),
                                   sw.hann(16, sym=True))
        np.testing.assert_allclose(w.get_window("hann_periodic", 16, False),
                                   sw.hann(16, sym=False))

    def test_errors(self):
        with pytest.raises(ValueError):
            w.get_window("nosuchwindow", 16)
        with pytest.raises(ValueError):
            w.get_window("kaiser", 16)  # missing required param
        with pytest.raises(ValueError):
            w.get_window(("hann", 1.0), 16)  # param not allowed
        with pytest.raises(ValueError):
            w.get_window("hann", 0)
        with pytest.raises(ValueError):
            w.get_window((3.0, 1.0), 16)  # first tuple entry not str

    def test_len_guards(self):
        assert w.hann(0).size == 0
        np.testing.assert_array_equal(w.hann(1), [1.0])
        with pytest.raises(ValueError):
            w.hann(-3)
        with pytest.raises(ValueError):
            w.hann(3.5)


class TestEstimatorIntegration:
    """The windows module broadens every estimator's accepted windows."""

    def test_signal_get_window_symmetric(self):
        import gpu_fft_tpu.signal as gs

        np.testing.assert_allclose(gs.get_window("tukey", 33, fftbins=False),
                                   ss.get_window("tukey", 33, fftbins=False))

    @pytest.mark.parametrize("window", ["tukey", "nuttall", ("gaussian", 16.0),
                                        ("exponential", None, 64.0), "cosine",
                                        ("dpss", 3.0), "lanczos", "triang"])
    def test_welch_new_windows_match_scipy(self, window):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(2048).astype(np.float32)
        f_ours, p_ours = __import__("gpu_fft_tpu").welch(x, fs=1e3, window=window,
                                                         nperseg=256)
        f_ref, p_ref = ss.welch(x.astype(np.float64), fs=1e3, window=window,
                                nperseg=256)
        np.testing.assert_allclose(f_ours, f_ref)
        np.testing.assert_allclose(p_ours, p_ref, rtol=2e-3, atol=1e-9)

    def test_stft_roundtrip_with_new_window(self):
        import gpu_fft_tpu as gf

        rng = np.random.default_rng(6)
        x = rng.standard_normal(1024).astype(np.float32)
        # gaussian is strictly positive, so every covered sample is
        # WOLA-recoverable (tukey/cosine zeros at frame edges leave the
        # boundary samples without window power — by construction)
        win = ("gaussian", 32.0)
        re, im = gf.stft(x, frame_size=128, hop=64, window=win)
        out = gf.istft(re, im, hop=64, window=win, length=x.size)
        np.testing.assert_allclose(np.asarray(out), x, atol=5e-6)
