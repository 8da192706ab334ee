"""Tests for the round-2 analysis-op extensions: STFT/ISTFT, Welch, Hilbert,
correlation, Fourier resampling, and DCT/DST.

Oracle strategy follows the reference's cross-backend parity pattern
(``tests/parity.rs``): an independent implementation — scipy.signal /
scipy.fft / numpy — is the numerical truth, with f32-scaled tolerances.
"""

import numpy as np
import pytest
import scipy.fft
import scipy.signal

import gpu_fft_tpu as gf

from conftest import assert_slice_approx


# ── STFT / ISTFT ─────────────────────────────────────────────────────────────


def _frames_oracle(x, frame_size, hop, window):
    w = gf.window_table(window, frame_size)
    num = (len(x) - frame_size) // hop + 1
    return np.stack(
        [np.fft.rfft(x[m * hop : m * hop + frame_size] * w) for m in range(num)]
    )


def test_stft_matches_windowed_rfft_frames(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    for window in (None, "hann", "hamming"):
        r, i = gf.stft(x, 256, hop=64, window=window)
        ref = _frames_oracle(x, 256, 64, window)
        assert r.shape == ref.shape == ((4000 - 256) // 64 + 1, 129)
        assert_slice_approx(r, ref.real, 2e-3, f"stft real {window}")
        assert_slice_approx(i, ref.imag, 2e-3, f"stft imag {window}")


@pytest.mark.parametrize("window", [None, "hann", "hamming", "blackman"])
@pytest.mark.parametrize("hop_div", [1, 2, 4])
def test_istft_roundtrip_exact_on_covered_samples(rng, window, hop_div):
    frame = 128
    hop = frame // hop_div
    x = rng.standard_normal(1024).astype(np.float32)
    r, i = gf.stft(x, frame, hop=hop, window=window)
    y = gf.istft(r, i, hop=hop, window=window, length=1024)
    num_frames = (1024 - frame) // hop + 1
    covered = (num_frames - 1) * hop + frame
    # WOLA reconstruction is exact wherever accumulated window power > 0.
    w = gf.window_table(window, frame).astype(np.float64)
    wsq = np.zeros(covered)
    for m in range(num_frames):
        wsq[m * hop : m * hop + frame] += w * w
    ok = wsq[:covered] > 1e-6
    assert_slice_approx(y[:covered][ok], x[:covered][ok], 2e-3, "istft roundtrip")


def test_stft_multichannel_matches_per_channel(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    r, i = gf.stft_device(x, 256, hop=64)
    assert r.shape == (3, (2048 - 256) // 64 + 1, 129)
    for c in range(3):
        rc, ic = gf.stft(x[c], 256, hop=64)
        assert_slice_approx(np.asarray(r[c]), rc, 1e-4, f"stft channel {c} real")
        assert_slice_approx(np.asarray(i[c]), ic, 1e-4, f"stft channel {c} imag")
    y = np.asarray(gf.istft_device(r, i, hop=64, length=2048))
    assert y.shape == (3, 2048)
    cov = ((2048 - 256) // 64) * 64 + 256
    assert_slice_approx(y[:, 1 : cov - 256], x[:, 1 : cov - 256], 2e-3, "istft channels")


def test_istft_length_pads_and_trims(rng):
    x = rng.standard_normal(512).astype(np.float32)
    r, i = gf.stft(x, 128, hop=64)
    assert gf.istft(r, i, hop=64, length=300).shape == (300,)
    assert gf.istft(r, i, hop=64, length=700).shape == (700,)


def test_stft_contracts():
    with pytest.raises(ValueError):
        gf.stft(np.zeros(100, np.float32), 100)  # not a power of two
    with pytest.raises(ValueError):
        gf.stft(np.zeros(10, np.float32), 64)  # shorter than one frame
    with pytest.raises(ValueError):
        gf.stft(np.zeros(512, np.float32), 64, window="bogus")
    with pytest.raises(ValueError):
        gf.istft(np.zeros((4, 33), np.float32), np.zeros((4, 32), np.float32))


# ── Welch ────────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("scaling", ["density", "spectrum"])
@pytest.mark.parametrize("window", ["hann", "hamming"])
def test_welch_matches_scipy(rng, scaling, window):
    fs = 200.0
    t = np.arange(4096) / fs
    x = (np.sin(2 * np.pi * 30.0 * t) + 0.3 * rng.standard_normal(t.size)).astype(
        np.float32
    )
    f, p = gf.welch(x, fs=fs, window=window, nperseg=256, scaling=scaling)
    f_ref, p_ref = scipy.signal.welch(
        x, fs=fs, window=window, nperseg=256, scaling=scaling
    )
    assert_slice_approx(f, f_ref, 1e-9, "welch freqs")
    scale = float(np.abs(p_ref).max())
    assert_slice_approx(p / scale, p_ref / scale, 1e-4, "welch psd (relative)")


def test_welch_detrend_and_overlap(rng):
    x = (rng.standard_normal(2048) + 5.0).astype(np.float32)  # big DC offset
    f, p = gf.welch(x, nperseg=128, noverlap=96)
    f_ref, p_ref = scipy.signal.welch(x, nperseg=128, noverlap=96)
    scale = float(np.abs(p_ref).max())
    assert_slice_approx(p / scale, p_ref / scale, 1e-4, "welch detrend+overlap")
    # detrend=False must differ at DC (the offset shows up).
    _, p_no = gf.welch(x, nperseg=128, noverlap=96, detrend=False)
    assert p_no[0] > p[0] * 100


def test_welch_peak_at_signal_frequency(rng):
    fs = 1000.0
    t = np.arange(8192) / fs
    x = np.sin(2 * np.pi * 125.0 * t).astype(np.float32)
    f, p = gf.welch(x, fs=fs, nperseg=512)
    assert abs(f[int(np.argmax(p))] - 125.0) < fs / 512


def test_welch_multichannel_matches_scipy(rng):
    x = rng.standard_normal((3, 2048)).astype(np.float32)
    f, p = gf.welch(x, fs=50.0, nperseg=128)
    f_ref, p_ref = scipy.signal.welch(x, fs=50.0, nperseg=128, axis=-1)
    assert np.asarray(p).shape == (3, 65)
    scale = float(np.abs(p_ref).max())
    assert_slice_approx(np.asarray(p) / scale, p_ref / scale, 1e-4, "welch channels")


def test_welch_contracts():
    with pytest.raises(ValueError):
        gf.welch(np.zeros(1024, np.float32), nperseg=100)
    with pytest.raises(ValueError):
        gf.welch(np.zeros(1024, np.float32), nperseg=128, noverlap=128)
    with pytest.raises(ValueError):
        gf.welch(np.zeros(1024, np.float32), scaling="bogus")
    with pytest.raises(ValueError):
        gf.welch(np.zeros(16, np.float32), nperseg=64)


def test_frame_signal_all_gcd_paths(rng):
    """frame_signal's strided-slice form must equal the gather at every
    (frame, hop) class: hop | frame, gcd < hop, coprime, and the
    many-slices gather fallback."""
    import jax.numpy as jnp

    from gpu_fft_tpu.ops.stft import frame_signal

    x = rng.standard_normal(4096).astype(np.float32)
    xj = jnp.asarray(x)
    for frame, hop in [(256, 64), (256, 96), (64, 7), (512, 3), (128, 128), (16, 40)]:
        num = (4096 - frame) // hop + 1
        got = np.asarray(frame_signal(xj, frame, hop, num))
        ref = np.stack([x[m * hop : m * hop + frame] for m in range(num)])
        assert_slice_approx(got, ref, 0.0, f"frame_signal f={frame} h={hop}")


def test_overlap_add_all_gcd_paths(rng):
    from gpu_fft_tpu.ops.stft import overlap_add

    for frame, hop in [(256, 64), (256, 96), (64, 7), (512, 3), (128, 128), (16, 40)]:
        num = 9
        frames = rng.standard_normal((num, frame)).astype(np.float32)
        total = (num - 1) * hop + frame + 5  # also exercises the tail pad
        got = np.asarray(overlap_add(frames, hop, total))
        ref = np.zeros(total, np.float64)
        for m in range(num):
            ref[m * hop : m * hop + frame] += frames[m].astype(np.float64)
        assert_slice_approx(got, ref, 1e-4, f"overlap_add f={frame} h={hop}")


# ── CSD / coherence / periodogram ────────────────────────────────────────────


def test_csd_matches_scipy(rng):
    fs = 100.0
    t = np.arange(4096) / fs
    x = (np.sin(2 * np.pi * 10 * t) + 0.5 * rng.standard_normal(t.size)).astype(np.float32)
    y = (np.sin(2 * np.pi * 10 * t + 0.7) + 0.5 * rng.standard_normal(t.size)).astype(
        np.float32
    )
    f, (pr, pi) = gf.csd(x, y, fs=fs, nperseg=256)
    f_ref, p_ref = scipy.signal.csd(x, y, fs=fs, nperseg=256)
    scale = float(np.abs(p_ref).max())
    assert_slice_approx(pr / scale, p_ref.real / scale, 1e-4, "csd real")
    assert_slice_approx(pi / scale, p_ref.imag / scale, 1e-4, "csd imag")


def test_csd_self_is_welch(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    f1, p = gf.welch(x, nperseg=128)
    f2, (pr, pi) = gf.csd(x, x, nperseg=128)
    assert_slice_approx(pr, p, 1e-6, "csd(x,x) == welch(x)")
    assert_slice_approx(pi, np.zeros_like(pi), 1e-6, "csd(x,x) imag")


def test_coherence_matches_scipy(rng):
    fs = 100.0
    t = np.arange(8192) / fs
    s = np.sin(2 * np.pi * 12.5 * t)
    x = (s + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    y = (0.5 * s + 1.0 * rng.standard_normal(t.size)).astype(np.float32)
    f, c = gf.coherence(x, y, fs=fs, nperseg=256)
    f_ref, c_ref = scipy.signal.coherence(x, y, fs=fs, nperseg=256)
    assert_slice_approx(c, c_ref, 1e-3, "coherence")
    assert np.all(np.asarray(c) >= 0) and np.all(np.asarray(c) <= 1.0 + 1e-6)


@pytest.mark.parametrize("n", [256, 1000, 999])
@pytest.mark.parametrize("scaling", ["density", "spectrum"])
def test_periodogram_matches_scipy(rng, n, scaling):
    x = rng.standard_normal(n).astype(np.float32)
    f, p = gf.periodogram(x, fs=50.0, scaling=scaling)
    f_ref, p_ref = scipy.signal.periodogram(x, fs=50.0, scaling=scaling)
    scale = max(1e-30, float(np.abs(p_ref).max()))
    assert_slice_approx(f, f_ref, 1e-9, f"periodogram freqs n={n}")
    assert_slice_approx(p / scale, p_ref / scale, 2e-4, f"periodogram n={n} {scaling}")


def test_periodogram_hann_window(rng):
    x = rng.standard_normal(512).astype(np.float32)
    f, p = gf.periodogram(x, window="hann")
    f_ref, p_ref = scipy.signal.periodogram(x, window="hann")
    scale = float(np.abs(p_ref).max())
    assert_slice_approx(p / scale, p_ref / scale, 2e-4, "periodogram hann")


def test_spectral_family_contracts():
    x = np.zeros(512, np.float32)
    with pytest.raises(ValueError):
        gf.csd(x, np.zeros(256, np.float32))
    with pytest.raises(ValueError):
        gf.coherence(x, np.zeros(256, np.float32))
    with pytest.raises(ValueError):
        gf.periodogram(np.zeros(1, np.float32))
    with pytest.raises(ValueError):
        gf.periodogram(x, scaling="bogus")


def test_fftfreq_helpers():
    assert_slice_approx(gf.utils.fftfreq(10, 0.1), np.fft.fftfreq(10, 0.1), 1e-6, "fftfreq")
    assert_slice_approx(
        gf.utils.rfftfreq(9, 0.2), np.fft.rfftfreq(9, 0.2), 1e-6, "rfftfreq"
    )


# ── Hilbert / envelope ───────────────────────────────────────────────────────


@pytest.mark.parametrize("n", [256, 1000, 257])  # pow2, even non-pow2, odd
def test_hilbert_matches_scipy(rng, n):
    x = rng.standard_normal(n).astype(np.float32)
    ar, ai = gf.hilbert(x)
    ref = scipy.signal.hilbert(x.astype(np.float64))
    assert_slice_approx(ar, ref.real, 2e-3, f"hilbert real n={n}")
    assert_slice_approx(ai, ref.imag, 2e-3, f"hilbert imag n={n}")


def test_hilbert_batched(rng):
    x = rng.standard_normal((3, 512)).astype(np.float32)
    ar, ai = gf.hilbert_device(x)
    ref = scipy.signal.hilbert(x.astype(np.float64), axis=-1)
    assert_slice_approx(np.asarray(ai), ref.imag, 2e-3, "hilbert batched")


def test_envelope_recovers_amplitude_modulation():
    t = np.arange(2048) / 2048.0
    a = 1.0 + 0.5 * np.sin(2 * np.pi * 3.0 * t)  # slow AM
    x = (a * np.cos(2 * np.pi * 200.0 * t)).astype(np.float32)
    env = gf.envelope(x)
    # Edges suffer from the finite-length analytic signal; check the interior.
    assert_slice_approx(env[200:-200], a[200:-200], 2e-2, "envelope")


# ── Correlation ──────────────────────────────────────────────────────────────


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fft_correlate_matches_numpy(rng, mode):
    a = rng.standard_normal(100).astype(np.float32)
    b = rng.standard_normal(30).astype(np.float32)
    got = gf.fft_correlate(a, b, mode=mode)
    ref = np.correlate(a.astype(np.float64), b.astype(np.float64), mode=mode)
    assert_slice_approx(got, ref, 2e-3, f"correlate {mode}")


def test_fft_correlate_valid_shorter_first(rng):
    a = rng.standard_normal(20).astype(np.float32)
    b = rng.standard_normal(50).astype(np.float32)
    got = gf.fft_correlate(a, b, mode="valid")
    ref = np.correlate(a.astype(np.float64), b.astype(np.float64), mode="valid")
    assert_slice_approx(got, ref, 2e-3, "correlate valid swapped")


def test_autocorrelation_peak_at_zero_lag(rng):
    x = rng.standard_normal(256).astype(np.float32)
    c = gf.fft_correlate(x, x, mode="full")
    assert int(np.argmax(c)) == 255  # zero lag at the center of 'full'
    assert abs(c[255] - float(x.astype(np.float64) @ x.astype(np.float64))) < 1e-2


# ── Fourier resampling ───────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "n,num",
    [(128, 64), (128, 256), (100, 40), (100, 250), (101, 37), (101, 202), (64, 63)],
)
def test_resample_matches_scipy(rng, n, num):
    x = rng.standard_normal(n).astype(np.float32)
    got = gf.resample(x, num)
    ref = scipy.signal.resample(x.astype(np.float64), num)
    assert got.shape == (num,)
    assert_slice_approx(got, ref, 3e-3, f"resample {n}->{num}")


def test_resample_batched_and_identity(rng):
    x = rng.standard_normal((4, 96)).astype(np.float32)
    same = np.asarray(gf.resample_device(x, 96))
    assert_slice_approx(same, x, 2e-3, "resample identity")
    up = np.asarray(gf.resample_device(x, 192))
    ref = scipy.signal.resample(x.astype(np.float64), 192, axis=-1)
    assert_slice_approx(up, ref, 3e-3, "resample batched up")


def test_resample_contracts():
    with pytest.raises(ValueError):
        gf.resample(np.zeros(16, np.float32), 0)
    with pytest.raises(ValueError):
        gf.resample(np.zeros((2, 2, 2), np.float32), 4)


# ── CZT / zoom FFT ───────────────────────────────────────────────────────────


@pytest.mark.parametrize("n,m", [(100, 100), (100, 37), (64, 200), (101, 101)])
def test_czt_default_matches_scipy(rng, n, m):
    x = rng.standard_normal(n).astype(np.float32)
    gr, gi = gf.czt(x, m=m)
    ref = scipy.signal.czt(x.astype(np.float64), m=m)
    scale = float(np.abs(ref).max())
    assert_slice_approx((gr + 1j * gi).real / scale, ref.real / scale, 2e-4, f"czt {n}->{m}")
    assert_slice_approx(gi / scale, ref.imag / scale, 2e-4, f"czt imag {n}->{m}")


def test_czt_equals_fft_at_dft_params(rng):
    x = rng.standard_normal(256).astype(np.float32)
    gr, gi = gf.czt(x)
    ref = np.fft.fft(x.astype(np.float64))
    assert_slice_approx(gr, ref.real, 1e-2, "czt==fft real")
    assert_slice_approx(gi, ref.imag, 1e-2, "czt==fft imag")


def test_czt_custom_w_a_matches_scipy(rng):
    x = rng.standard_normal(80).astype(np.float32)
    w = np.exp(-2j * np.pi / 97) * 1.001  # mild spiral
    a = np.exp(2j * np.pi * 0.13) * 0.998
    gr, gi = gf.czt(x, m=50, w=complex(w), a=complex(a))
    ref = scipy.signal.czt(x.astype(np.float64), m=50, w=w, a=a)
    scale = float(np.abs(ref).max())
    assert_slice_approx(gr / scale, ref.real / scale, 5e-4, "czt spiral real")
    assert_slice_approx(gi / scale, ref.imag / scale, 5e-4, "czt spiral imag")


@pytest.mark.parametrize("fn", [[100.0, 150.0], 80.0])
def test_zoom_fft_matches_scipy(rng, fn):
    fs = 400.0
    x = rng.standard_normal(1000).astype(np.float32)
    gr, gi = gf.zoom_fft(x, fn, m=128, fs=fs)
    ref = scipy.signal.zoom_fft(x.astype(np.float64), fn, m=128, fs=fs)
    scale = float(np.abs(ref).max())
    assert_slice_approx(gr / scale, ref.real / scale, 2e-4, "zoom_fft real")
    assert_slice_approx(gi / scale, ref.imag / scale, 2e-4, "zoom_fft imag")


def test_zoom_fft_resolves_close_tones(rng):
    # Two tones 0.3 Hz apart in an 8-second record (intrinsic resolution
    # 0.125 Hz): the 256-point zoom over [99, 101] Hz shows both peaks at
    # ~0.008 Hz spacing without computing an 8000-point spectrum.
    fs = 1000.0
    t = np.arange(8000) / fs
    x = (np.sin(2 * np.pi * 99.8 * t) + np.sin(2 * np.pi * 100.1 * t)).astype(np.float32)
    gr, gi = gf.zoom_fft(x, [99.0, 101.0], m=256, fs=fs)
    mag = np.hypot(gr, gi)
    freqs = 99.0 + np.arange(256) * (2.0 / 256)
    peaks = [
        freqs[i]
        for i in range(1, 255)
        if mag[i] > mag[i - 1] and mag[i] > mag[i + 1] and mag[i] > mag.max() * 0.5
    ]
    assert any(abs(p - 99.8) < 0.05 for p in peaks), peaks
    assert any(abs(p - 100.1) < 0.05 for p in peaks), peaks


def test_czt_chirp_phase_exact_reduction():
    # The default-w / zoom-fft chirp phase reduces mod 2*den on INTEGERS, so
    # it must agree with exact rational arithmetic even at j ~ 2^20 where the
    # f64 product e * theta has long since lost the low bits.
    from fractions import Fraction

    from gpu_fft_tpu.ops.czt import _phase_halfturns_exact

    j = np.asarray([1, 12345, (1 << 20) - 3, 1 << 20], dtype=np.int64)
    e = j * j
    for num, den in [(-1, 1000003), (7, 48000), (-(10**14) - 1, (1 << 51) + 5)]:
        got = _phase_halfturns_exact(e, num, den)
        want = [float((Fraction(int(v)) * num / den) % 2) for v in e]
        assert np.abs(got - np.asarray(want)).max() < 1e-12, (num, den)


def test_czt_asymmetric_large_n_small_m(rng):
    # n >> m is exactly the regime where the old f64 phase reduction drifted;
    # the exact integer-mod path keeps parity with scipy's f64 oracle.
    x = rng.standard_normal(30000).astype(np.float32)
    gr, gi = gf.czt(x, m=17)
    ref = scipy.signal.czt(x.astype(np.float64), m=17)
    scale = float(np.abs(ref).max())
    assert_slice_approx(gr / scale, ref.real / scale, 2e-4, "czt asym real")
    assert_slice_approx(gi / scale, ref.imag / scale, 2e-4, "czt asym imag")


def test_czt_batched_and_contracts(rng):
    x = rng.standard_normal((3, 64)).astype(np.float32)
    gr, gi = gf.czt_device(x, m=40)
    ref = scipy.signal.czt(x.astype(np.float64), m=40, axis=-1)
    scale = float(np.abs(ref).max())
    assert_slice_approx(np.asarray(gr) / scale, ref.real / scale, 2e-4, "czt batched")
    with pytest.raises(ValueError):
        gf.czt(np.zeros(16, np.float32), m=0)
    with pytest.raises(ValueError):
        gf.czt(np.zeros(16, np.float32), w=0.0)
    with pytest.raises(ValueError):
        gf.zoom_fft(np.zeros(16, np.float32), [1.0, 2.0, 3.0])
    with pytest.raises(ValueError):
        gf.zoom_fft(np.zeros(16, np.float32), 1.0, fs=-1.0)


# ── DCT / DST ────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("n", [64, 100, 101, 256])
@pytest.mark.parametrize("type", [2, 3])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dct_matches_scipy(rng, n, type, norm):
    x = rng.standard_normal(n).astype(np.float32)
    got = gf.dct(x, type=type, norm=norm)
    ref = scipy.fft.dct(x.astype(np.float64), type=type, norm=norm)
    scale = max(1.0, float(np.abs(ref).max()))
    assert_slice_approx(got / scale, ref / scale, 2e-4, f"dct{type} n={n} {norm}")


@pytest.mark.parametrize("n", [64, 100, 101])
@pytest.mark.parametrize("type", [2, 3])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dst_matches_scipy(rng, n, type, norm):
    x = rng.standard_normal(n).astype(np.float32)
    got = gf.dst(x, type=type, norm=norm)
    ref = scipy.fft.dst(x.astype(np.float64), type=type, norm=norm)
    scale = max(1.0, float(np.abs(ref).max()))
    assert_slice_approx(got / scale, ref / scale, 2e-4, f"dst{type} n={n} {norm}")


@pytest.mark.parametrize("fn,ifn", [(gf.dct, gf.idct), (gf.dst, gf.idst)])
@pytest.mark.parametrize("type", [2, 3])
@pytest.mark.parametrize("norm", [None, "ortho"])
def test_dct_dst_roundtrip(rng, fn, ifn, type, norm):
    x = rng.standard_normal(96).astype(np.float32)
    y = ifn(fn(x, type=type, norm=norm), type=type, norm=norm)
    assert_slice_approx(y, x, 2e-3, f"{fn.__name__} roundtrip type={type} {norm}")


def test_dct_batched_device(rng):
    x = rng.standard_normal((5, 80)).astype(np.float32)
    got = np.asarray(gf.dct_device(x))
    ref = scipy.fft.dct(x.astype(np.float64), axis=-1)
    scale = float(np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-4, "dct batched")


def test_dct_contracts():
    with pytest.raises(ValueError):
        gf.dct(np.zeros(16, np.float32), type=5)  # types 1-4 only
    with pytest.raises(ValueError):
        gf.dct(np.zeros(16, np.float32), norm="forward")
    with pytest.raises(ValueError):
        gf.dst(np.zeros((2, 2, 2), np.float32))


# ── extended window family ───────────────────────────────────────────────────


@pytest.mark.parametrize(
    "window", ["hann", "hamming", "blackman", "bartlett", "blackmanharris",
               "flattop", ("kaiser", 8.6)]
)
@pytest.mark.parametrize("n", [7, 64, 255, 256])
def test_window_table_matches_scipy_periodic(window, n):
    got = gf.window_table(window, n)
    ref = scipy.signal.get_window(window, n, fftbins=True)
    np.testing.assert_allclose(got, ref, atol=2e-7)


def test_welch_with_extended_windows(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    for window in ("blackmanharris", "flattop", ("kaiser", 12.0)):
        f, p = gf.welch(x, nperseg=256, window=window)
        sw = window
        f_ref, p_ref = scipy.signal.welch(x, nperseg=256, window=sw)
        scale = p_ref.max()
        assert_slice_approx(p / scale, p_ref / scale, 2e-3, f"welch {window}")


def test_stft_roundtrip_with_kaiser_window(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    r, i = gf.stft(x, 256, hop=64, window=("kaiser", 8.6))
    y = gf.istft(r, i, hop=64, window=("kaiser", 8.6), length=2048)
    num = (2048 - 256) // 64 + 1
    cov = (num - 1) * 64 + 256
    assert_slice_approx(y[:cov], x[:cov], 2e-3, "kaiser stft roundtrip")


def test_window_table_rejects_unknown():
    with pytest.raises(ValueError):
        gf.window_table("nosuchwindow", 64)
    with pytest.raises(ValueError):
        gf.window_table(("kaiser",), 64)  # missing required beta


def test_window_table_accepts_all_scipy_families():
    import scipy.signal as _ss

    for win in ("tukey", "nuttall", ("gaussian", 12.0), ("dpss", 2.5), "lanczos"):
        got = gf.window_table(win, 64)
        ref = _ss.get_window(win, 64, fftbins=True)
        assert got.dtype == np.float32
        assert np.abs(got - ref.astype(np.float32)).max() < 1e-6


@pytest.mark.parametrize("detrend", ["linear", False])
def test_welch_detrend_modes_match_scipy(rng, detrend):
    t = np.arange(8192, dtype=np.float32)
    x = (0.001 * t + np.sin(2 * np.pi * 0.01 * t)
         + rng.standard_normal(8192)).astype(np.float32)
    f, p = gf.welch(x, nperseg=256, detrend=detrend)
    f_ref, p_ref = scipy.signal.welch(x, nperseg=256, detrend=detrend)
    scale = p_ref.max()
    assert_slice_approx(p / scale, p_ref / scale, 2e-3, f"welch detrend={detrend}")


def test_periodogram_linear_detrend_matches_scipy(rng):
    t = np.arange(4096, dtype=np.float32)
    x = (0.01 * t + rng.standard_normal(4096)).astype(np.float32)
    f, p = gf.periodogram(x, detrend="linear")
    f_ref, p_ref = scipy.signal.periodogram(x, detrend="linear")
    scale = p_ref.max()
    assert_slice_approx(p / scale, p_ref / scale, 2e-3, "periodogram linear detrend")


def test_csd_linear_detrend_matches_scipy(rng):
    t = np.arange(8192, dtype=np.float32)
    x = (0.002 * t + rng.standard_normal(8192)).astype(np.float32)
    y = (0.001 * t + rng.standard_normal(8192)).astype(np.float32)
    f, (cr, ci) = gf.csd(x, y, nperseg=256, detrend="linear")
    f_ref, c_ref = scipy.signal.csd(x, y, nperseg=256, detrend="linear")
    scale = np.abs(c_ref).max()
    assert_slice_approx(cr / scale, c_ref.real / scale, 2e-3, "csd linear re")
    assert_slice_approx(ci / scale, c_ref.imag / scale, 2e-3, "csd linear im")


def test_detrend_rejects_unknown():
    with pytest.raises(ValueError):
        gf.welch(np.ones(1024, np.float32), detrend="quadratic")


def test_welch_median_average_matches_scipy(rng):
    x = rng.standard_normal(16384).astype(np.float32)
    x[5000:5020] += 40.0  # a transient spike the median should reject
    f, p = gf.welch(x, nperseg=256, average="median")
    f_ref, p_ref = scipy.signal.welch(x, nperseg=256, average="median")
    scale = p_ref.max()
    assert_slice_approx(p / scale, p_ref / scale, 2e-3, "welch median")
    # And it is actually robust: spike inflates the mean, not the median.
    _, p_mean = gf.welch(x, nperseg=256, average="mean")
    assert p_mean.mean() > p.mean() * 2.0


def test_welch_median_multichannel(rng):
    x = rng.standard_normal((3, 8192)).astype(np.float32)
    f, p = gf.welch(x, nperseg=128, average="median")
    f_ref, p_ref = scipy.signal.welch(x, nperseg=128, average="median", axis=-1)
    assert p.shape == p_ref.shape
    scale = p_ref.max()
    assert_slice_approx(p / scale, p_ref / scale, 2e-3, "welch median channels")


def test_welch_average_contract():
    with pytest.raises(ValueError):
        gf.welch(np.ones(1024, np.float32), average="mode")


def test_welch_nfft_matches_scipy(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    f, p = gf.welch(x, fs=100.0, nperseg=256, nfft=1024)
    f_ref, p_ref = scipy.signal.welch(x, fs=100.0, nperseg=256, nfft=1024)
    assert p.shape == p_ref.shape == (513,)
    np.testing.assert_allclose(f, f_ref, atol=1e-9)
    scale = p_ref.max()
    assert_slice_approx(p / scale, p_ref / scale, 2e-3, "welch nfft")


def test_csd_nfft_matches_scipy(rng):
    x = rng.standard_normal(8192).astype(np.float32)
    y = rng.standard_normal(8192).astype(np.float32)
    f, (cr, ci) = gf.csd(x, y, nperseg=128, nfft=512)
    f_ref, c_ref = scipy.signal.csd(x, y, nperseg=128, nfft=512)
    assert cr.shape == c_ref.shape
    scale = np.abs(c_ref).max()
    assert_slice_approx(cr / scale, c_ref.real / scale, 2e-3, "csd nfft re")
    assert_slice_approx(ci / scale, c_ref.imag / scale, 2e-3, "csd nfft im")


def test_welch_nfft_contract():
    with pytest.raises(ValueError):
        gf.welch(np.ones(4096, np.float32), nperseg=256, nfft=128)  # < nperseg
    with pytest.raises(ValueError):
        gf.welch(np.ones(4096, np.float32), nperseg=256, nfft=300)  # not pow2


@pytest.mark.parametrize("spec", [("tukey", 0.25), ("tukey", 0.75), ("gaussian", 12.0)])
@pytest.mark.parametrize("n", [64, 255, 256])
def test_tukey_gaussian_windows_match_scipy(spec, n):
    got = gf.window_table(spec, n)
    ref = scipy.signal.get_window(spec, n, fftbins=True)
    np.testing.assert_allclose(got, ref, atol=2e-7)


def test_welch_tukey_matches_scipy(rng):
    # scipy.signal.spectrogram's default window family.
    x = rng.standard_normal(8192).astype(np.float32)
    f, p = gf.welch(x, nperseg=256, window=("tukey", 0.25))
    f_ref, p_ref = scipy.signal.welch(x, nperseg=256, window=("tukey", 0.25))
    scale = p_ref.max()
    assert_slice_approx(p / scale, p_ref / scale, 2e-3, "welch tukey")


# ── stft_scipy / istft_scipy (drop-in scipy.signal.stft/istft) ──────────────


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"noverlap": 192},
        {"nfft": 512},
        {"boundary": None, "padded": False},
        {"window": ("tukey", 0.25)},
    ],
)
def test_stft_scipy_matches_scipy(rng, kw):
    x = rng.standard_normal(4000).astype(np.float32)
    f, t, (zr, zi) = gf.stft_scipy(x, fs=100.0, **kw)
    f_r, t_r, Z = scipy.signal.stft(x.astype(np.float64), fs=100.0, **kw)
    assert zr.shape == Z.shape  # scipy's (bins, num_frames) orientation
    np.testing.assert_allclose(f, f_r, atol=1e-9)
    np.testing.assert_allclose(t, t_r, atol=1e-9)
    scale = np.abs(Z).max()
    assert np.abs((zr + 1j * zi) - Z).max() / scale < 2e-3


def test_istft_scipy_roundtrip_matches_scipy(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    f, t, (zr, zi) = gf.stft_scipy(x, fs=100.0)
    t2, y = gf.istft_scipy(zr, zi, fs=100.0)
    _, y_ref = scipy.signal.istft(
        scipy.signal.stft(x.astype(np.float64), fs=100.0)[2], fs=100.0
    )
    n = min(y.shape[0], y_ref.shape[0])
    assert np.abs(y[:n] - y_ref[:n]).max() < 1e-4
    assert np.abs(y[:4000] - x).max() < 1e-4  # true reconstruction


def test_istft_scipy_nfft_roundtrip(rng):
    x = rng.standard_normal(2048).astype(np.float32)
    f, t, (zr, zi) = gf.stft_scipy(x, nperseg=128, nfft=256)
    _, y = gf.istft_scipy(zr, zi, nperseg=128)
    assert np.abs(y[:2048] - x).max() < 1e-4


def test_stft_scipy_contracts():
    with pytest.raises(ValueError):
        gf.stft_scipy(np.ones((2, 100), np.float32))
    with pytest.raises(ValueError):
        gf.stft_scipy(np.ones(1000, np.float32), nperseg=100)
    with pytest.raises(ValueError):
        gf.stft_scipy(np.ones(1000, np.float32), boundary="reflect")
    with pytest.raises(ValueError):  # shorter than one segment: loud, not silent
        gf.stft_scipy(np.ones(100, np.float32), nperseg=256)
    with pytest.raises(ValueError):
        gf.istft_scipy(np.ones((65, 4), np.float32), np.ones((64, 4), np.float32))
    z = np.ones((65, 4), np.float32)
    with pytest.raises(ValueError):  # noverlap >= nperseg would mean hop <= 0
        gf.istft_scipy(z, z, noverlap=128)
    with pytest.raises(ValueError):
        gf.istft_scipy(z, z, nperseg=100)
    with pytest.raises(ValueError):  # nperseg beyond the spectra's nfft
        gf.istft_scipy(z, z, nperseg=256)


def test_envelope_device_matches_host(rng):
    t = np.arange(4096, dtype=np.float32) / 1000.0
    am = (1.0 + 0.5 * np.sin(2 * np.pi * 3.0 * t)).astype(np.float32)
    x = (am * np.sin(2 * np.pi * 125.0 * t)).astype(np.float32)
    dev = np.asarray(gf.envelope_device(x))
    host = gf.envelope(x)
    assert np.abs(dev - host).max() < 1e-5
    core = slice(200, -200)
    assert np.abs(dev[core] - am[core]).max() < 0.05
