"""ShortTimeFFT: element-wise differential parity against scipy.signal.

scipy ships in this image, so the oracle is scipy's own ShortTimeFFT — every
value, geometry property, border, padding mode, scaling, and constructor is
compared element-wise (the same strategy the reference uses for its
cross-backend parity suite, tests/parity.rs:8-125, with scipy in the role
of the second backend).
"""

import numpy as np
import pytest
import scipy.signal as ss
from scipy.signal.windows import hamming, hann, kaiser

from gpu_fft_tpu.signal import ShortTimeFFT

RNG = np.random.default_rng(0)


def assert_close(a, b, tol=2e-4, label=""):
    a, b = np.asarray(a), np.asarray(b)
    assert a.shape == b.shape, f"{label}: {a.shape} vs {b.shape}"
    scale = max(np.abs(b).max(), 1e-9)
    err = np.abs(a - b).max() / scale
    assert err <= tol, f"{label}: rel err {err:.2e}"


GRID = [
    (hann(8, sym=False), 3, 10.0),
    (hamming(10, sym=False), 4, 2.0),
    (kaiser(12, 8.0, sym=False), 5, 1.0),
    (np.ones(7), 2, 5.0),
]


@pytest.mark.parametrize("w,hop,fs", GRID, ids=["hann8", "hamming10", "kaiser12", "rect7"])
@pytest.mark.parametrize("fft_mode", ["onesided", "twosided", "centered"])
@pytest.mark.parametrize("ps", [0, None, 2])
def test_stft_istft_and_geometry_match_scipy(w, hop, fs, fft_mode, ps):
    for mfft in (len(w), len(w) + 5):  # identity and zero-padded (odd mffts too)
        kw = dict(fft_mode=fft_mode, mfft=mfft, phase_shift=ps)
        ref = ss.ShortTimeFFT(w, hop, fs, **kw)
        got = ShortTimeFFT(w, hop, fs, **kw)
        n = 37
        x = RNG.standard_normal(n)
        if fft_mode in ("twosided", "centered"):
            x = x + 1j * RNG.standard_normal(n)
        for attr in ("p_min", "k_min", "m_num", "m_num_mid", "f_pts",
                     "delta_t", "delta_f", "invertible", "onesided_fft"):
            assert getattr(ref, attr) == getattr(got, attr), attr
        assert (ref.p_max(n), ref.k_max(n)) == (got.p_max(n), got.k_max(n))
        assert ref.lower_border_end == got.lower_border_end
        assert ref.upper_border_begin(n) == got.upper_border_begin(n)
        assert ref.nearest_k_p(11) == got.nearest_k_p(11)
        assert ref.nearest_k_p(11, left=False) == got.nearest_k_p(11, left=False)
        assert_close(got.f, ref.f, 1e-9, "f")
        assert_close(got.t(n), ref.t(n), 1e-9, "t")
        assert_close(got.dual_win, ref.dual_win, 1e-7, "dual_win")
        Z_ref, Z_got = ref.stft(x), got.stft(x)
        assert_close(Z_got, Z_ref, 2e-4, "stft")
        assert_close(got.istft(Z_got.astype(np.complex128), k1=n),
                     ref.istft(Z_ref, k1=n), 2e-4, "istft")
        if fft_mode != "twosided":
            assert_close(np.array(got.extent(n)), np.array(ref.extent(n)), 1e-9, "extent")
            assert_close(np.array(got.extent(n, "ft", True)),
                         np.array(ref.extent(n, "ft", True)), 1e-9, "extent ft")


@pytest.mark.parametrize("padding", ["zeros", "edge", "even", "odd"])
def test_padding_modes_match_scipy(padding):
    w = hann(8, sym=False)
    x = RNG.standard_normal(37)
    ref = ss.ShortTimeFFT(w, 3, 10.0)
    got = ShortTimeFFT(w, 3, 10.0)
    assert_close(got.stft(x, padding=padding), ref.stft(x, padding=padding),
                 2e-4, padding)


@pytest.mark.parametrize("sc", ["magnitude", "psd"])
def test_scalings_and_onesided2x(sc):
    w = hann(8, sym=False)
    x = RNG.standard_normal(37)
    ref = ss.ShortTimeFFT(w, 3, 10.0, fft_mode="onesided2X", scale_to=sc)
    got = ShortTimeFFT(w, 3, 10.0, fft_mode="onesided2X", scale_to=sc)
    assert got.scaling == sc
    assert np.isclose(got.fac_magnitude, ref.fac_magnitude)
    assert np.isclose(got.fac_psd, ref.fac_psd)
    assert_close(got.win, ref.win, 1e-9, "scaled win")
    Z = got.stft(x)
    assert_close(Z, ref.stft(x), 2e-4, "onesided2X stft")
    assert_close(got.istft(Z.astype(np.complex128), k1=37), x, 2e-4, "roundtrip")


def test_detrend_spectrogram_partial_and_offsets():
    x = RNG.standard_normal(37)
    ref = ss.ShortTimeFFT.from_window("hann", 10.0, 8, 5)
    got = ShortTimeFFT.from_window("hann", 10.0, 8, 5)
    assert_close(got.stft(x), ref.stft(x), 2e-4, "from_window")
    assert_close(got.stft_detrend(x, "linear"), ref.stft_detrend(x, "linear"),
                 2e-4, "linear")
    assert_close(got.stft_detrend(x, "constant"), ref.stft_detrend(x, "constant"),
                 2e-4, "constant")
    assert_close(got.spectrogram(x), ref.spectrogram(x), 2e-4, "spectrogram")
    assert_close(got.stft(x, p0=2, p1=7), ref.stft(x, p0=2, p1=7), 2e-4, "p range")
    assert_close(got.stft(x, k_offset=4), ref.stft(x, k_offset=4), 2e-4, "k_offset")
    xm = RNG.standard_normal((3, 37))
    assert_close(got.stft(xm), ref.stft(xm), 2e-4, "multichannel")
    assert_close(got.istft(got.stft(xm).astype(np.complex128), k1=37),
                 ref.istft(ref.stft(xm), k1=37), 2e-4, "multichannel istft")


def test_alt_constructors_match_scipy():
    w = hann(8, sym=False)
    ref = ss.ShortTimeFFT.from_dual(w, 3, 10.0)
    got = ShortTimeFFT.from_dual(w, 3, 10.0)
    assert_close(got.win, ref.win, 1e-7, "from_dual")
    ref = ss.ShortTimeFFT.from_win_equals_dual(w, 3, 10.0)
    got = ShortTimeFFT.from_win_equals_dual(w, 3, 10.0)
    assert_close(got.win, ref.win, 1e-7, "from_win_equals_dual win")
    assert_close(got.dual_win, ref.dual_win, 1e-7, "from_win_equals_dual dual")


def test_validation_errors():
    w = hann(8, sym=False)
    with pytest.raises(ValueError):
        ShortTimeFFT(w, 0, 1.0)  # hop < 1
    with pytest.raises(ValueError):
        ShortTimeFFT(w, 3, -1.0)  # bad fs
    with pytest.raises(ValueError):
        ShortTimeFFT(w, 3, 1.0, mfft=4)  # mfft < len(win)
    with pytest.raises(ValueError):
        ShortTimeFFT(w, 3, 1.0, fft_mode="bogus")
    with pytest.raises(ValueError):
        ShortTimeFFT(w, 3, 1.0, fft_mode="onesided2X")  # needs scale_to
    with pytest.raises(ValueError):
        ShortTimeFFT(w, 3, 1.0, phase_shift=99)
    s = ShortTimeFFT(w, 3, 1.0)
    with pytest.raises(ValueError):
        s.stft(RNG.standard_normal(37) * 1j)  # complex input, onesided
    with pytest.raises(ValueError):
        s.stft(RNG.standard_normal(37), p0=0, p1=0)
    with pytest.raises(ValueError):
        s.istft(np.zeros((3, 4), np.complex64))  # wrong f_pts
    # non-invertible geometry: hop larger than the window support
    bad = ShortTimeFFT(np.ones(4), 9, 1.0)
    assert not bad.invertible
    with pytest.raises(ValueError):
        bad.istft(np.zeros((3, 5), np.complex64))


def test_nonpow2_mfft_rides_exact_path():
    """mfft = 12 (non-pow2) runs through the mixed-radix exact dispatch —
    the spectra still match scipy element-wise (covered above); this pins
    the roundtrip at a non-pow2 mfft with mfft > m_num."""
    w = hann(10, sym=False)
    got = ShortTimeFFT(w, 3, 1.0, mfft=12)
    x = RNG.standard_normal(41).astype(np.float32)
    Z = got.stft(x)
    assert Z.shape[0] == 7  # 12 // 2 + 1
    assert_close(got.istft(Z, k1=41), x, 2e-4, "non-pow2 roundtrip")
