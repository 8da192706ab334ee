"""Tests for the FIR filtering family: overlap-add convolution, window-method
design, causal and zero-phase application, frequency response.

Oracle strategy follows the reference's cross-backend parity pattern
(``tests/parity.rs``): scipy.signal is the numerical truth, with f32-scaled
tolerances.
"""

import numpy as np
import pytest
import scipy.signal

import gpu_fft_tpu as gf

from conftest import assert_slice_approx


# ── oaconvolve ───────────────────────────────────────────────────────────────


@pytest.mark.parametrize("n,lh", [(2000, 33), (20000, 64), (50000, 257), (5000, 1)])
def test_oaconvolve_matches_scipy_full(rng, n, lh):
    x = rng.standard_normal(n).astype(np.float32)
    h = rng.standard_normal(lh).astype(np.float32)
    got = gf.oaconvolve(x, h)
    ref = scipy.signal.oaconvolve(x.astype(np.float64), h.astype(np.float64))
    assert got.shape == (n + lh - 1,)
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"oaconvolve n={n} lh={lh}")


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_oaconvolve_modes_match_numpy(rng, mode):
    x = rng.standard_normal(3000).astype(np.float32)
    h = rng.standard_normal(41).astype(np.float32)
    got = gf.oaconvolve(x, h, mode=mode)
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64), mode=mode)
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"oaconvolve mode={mode}")


def test_oaconvolve_commutes_when_kernel_longer(rng):
    x = rng.standard_normal(50).astype(np.float32)
    h = rng.standard_normal(4000).astype(np.float32)
    got = gf.oaconvolve(x, h)
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64))
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, "oaconvolve swapped")


def test_oaconvolve_agrees_with_fft_convolve(rng):
    x = rng.standard_normal(10000).astype(np.float32)
    h = rng.standard_normal(100).astype(np.float32)
    a = gf.oaconvolve(x, h)
    b = gf.fft_convolve(x, h)
    scale = max(1.0, np.abs(b).max())
    assert_slice_approx(a / scale, b / scale, 2e-3, "oaconvolve vs fft_convolve")


def test_oaconvolve_device_batched_matches_rows(rng):
    x = rng.standard_normal((3, 8000)).astype(np.float32)
    h = rng.standard_normal(65).astype(np.float32)
    out = np.asarray(gf.oaconvolve_device(x, h))
    assert out.shape == (3, 8000 + 64)
    for i in range(3):
        ref = np.convolve(x[i].astype(np.float64), h.astype(np.float64))
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(out[i] / scale, ref / scale, 2e-3, f"batched row {i}")


def test_oaconvolve_device_batched_kernels(rng):
    x = rng.standard_normal((2, 6000)).astype(np.float32)
    h = rng.standard_normal((2, 33)).astype(np.float32)
    out = np.asarray(gf.oaconvolve_device(x, h))
    for i in range(2):
        ref = np.convolve(x[i].astype(np.float64), h[i].astype(np.float64))
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(out[i] / scale, ref / scale, 2e-3, f"per-row kernel {i}")


def test_oaconvolve_block_override(rng):
    x = rng.standard_normal(12000).astype(np.float32)
    h = rng.standard_normal(50).astype(np.float32)
    ref = np.convolve(x.astype(np.float64), h.astype(np.float64))
    scale = max(1.0, np.abs(ref).max())
    for block in (256, 1024, 4096):
        got = gf.oaconvolve(x, h, block=block)
        assert_slice_approx(got / scale, ref / scale, 2e-3, f"block={block}")


def test_oaconvolve_tiny_delegates_to_single_transform(rng):
    x = rng.standard_normal(40).astype(np.float32)
    h = rng.standard_normal(7).astype(np.float32)
    got = gf.oaconvolve(x, h)
    ref = np.convolve(x, h)
    assert_slice_approx(got, ref, 1e-3, "tiny")


def test_oaconvolve_contract_errors(rng):
    with pytest.raises(ValueError):
        gf.oaconvolve([], [1.0])
    with pytest.raises(ValueError):
        gf.oaconvolve([1.0], [1.0], mode="nope")
    with pytest.raises(ValueError):
        gf.oaconvolve(np.ones(5000), np.ones(100), block=100)  # not pow2
    with pytest.raises(ValueError):
        gf.oaconvolve(np.ones(5000), np.ones(100), block=128)  # < 2*lh
    with pytest.raises(ValueError):
        gf.oaconvolve_device(np.ones((2, 50)), np.ones((3, 5)))


def test_oaconvolve_jit_composable(rng):
    import jax

    x = rng.standard_normal((2, 5000)).astype(np.float32)
    h = rng.standard_normal(33).astype(np.float32)
    f = jax.jit(lambda a: gf.oaconvolve_device(a, h))
    out = np.asarray(f(x))
    ref = np.asarray(gf.oaconvolve_device(x, h))
    assert_slice_approx(out, ref, 1e-5, "jit vs eager")


# ── firwin ───────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("numtaps", [5, 16, 65, 128])
def test_firwin_lowpass_matches_scipy(numtaps):
    got = gf.firwin(numtaps, 0.3)
    ref = scipy.signal.firwin(numtaps, 0.3)
    np.testing.assert_allclose(got, ref, atol=1e-12)


@pytest.mark.parametrize("window", ["hamming", "hann", "blackman", "rect"])
def test_firwin_windows_match_scipy(window):
    sc_win = {"rect": "boxcar"}.get(window, window)
    got = gf.firwin(33, 0.25, window=window)
    ref = scipy.signal.firwin(33, 0.25, window=sc_win)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_highpass_matches_scipy():
    got = gf.firwin(31, 0.4, pass_zero=False)
    ref = scipy.signal.firwin(31, 0.4, pass_zero=False)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_bandpass_matches_scipy():
    got = gf.firwin(65, [0.2, 0.5], pass_zero=False)
    ref = scipy.signal.firwin(65, [0.2, 0.5], pass_zero=False)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_bandstop_matches_scipy():
    got = gf.firwin(65, [0.2, 0.5], pass_zero=True)
    ref = scipy.signal.firwin(65, [0.2, 0.5], pass_zero=True)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_fs_and_scale_match_scipy():
    got = gf.firwin(41, 100.0, fs=1000.0, scale=False)
    ref = scipy.signal.firwin(41, 100.0, fs=1000.0, scale=False)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_contract_errors():
    with pytest.raises(ValueError):
        gf.firwin(0, 0.5)
    with pytest.raises(ValueError):
        gf.firwin(10, 0.0)  # edge at DC
    with pytest.raises(ValueError):
        gf.firwin(10, 1.0)  # edge at Nyquist
    with pytest.raises(ValueError):
        gf.firwin(10, [0.5, 0.3])  # not increasing
    with pytest.raises(ValueError):
        gf.firwin(10, 0.4, pass_zero=False)  # even taps, Nyquist passband


# ── fftfilt / filtfilt ───────────────────────────────────────────────────────


def test_fftfilt_matches_lfilter(rng):
    x = rng.standard_normal(5000).astype(np.float32)
    h = gf.firwin(51, 0.2).astype(np.float32)
    got = gf.fftfilt(x, h)
    ref = scipy.signal.lfilter(h.astype(np.float64), [1.0], x.astype(np.float64))
    assert got.shape == x.shape
    assert_slice_approx(got, ref, 2e-3, "fftfilt vs lfilter")


def test_fftfilt_device_batched(rng):
    x = rng.standard_normal((4, 3000)).astype(np.float32)
    h = gf.firwin(31, 0.35).astype(np.float32)
    out = np.asarray(gf.fftfilt_device(x, h))
    assert out.shape == x.shape
    for i in range(4):
        ref = scipy.signal.lfilter(h.astype(np.float64), [1.0], x[i].astype(np.float64))
        assert_slice_approx(out[i], ref, 2e-3, f"fftfilt row {i}")


def test_filtfilt_matches_scipy(rng):
    x = rng.standard_normal(4000).astype(np.float32)
    h = gf.firwin(21, 0.25).astype(np.float32)
    got = gf.filtfilt_fir(x, h)
    ref = scipy.signal.filtfilt(h.astype(np.float64), [1.0], x.astype(np.float64))
    assert got.shape == x.shape
    assert_slice_approx(got, ref, 5e-3, "filtfilt vs scipy")


def test_filtfilt_zero_phase(rng):
    # A low-frequency sine passes through filtfilt with no phase shift.
    t = np.arange(4096, dtype=np.float32)
    x = np.sin(2 * np.pi * 0.01 * t).astype(np.float32)
    h = gf.firwin(65, 0.2).astype(np.float32)
    y = gf.filtfilt_fir(x, h)
    core = slice(200, -200)  # away from edge transients
    assert_slice_approx(y[core], x[core], 2e-2, "zero phase passband")


def test_filtfilt_padlen_contract():
    with pytest.raises(ValueError):
        gf.filtfilt_fir(np.ones(10, np.float32), np.ones(4, np.float32))  # padlen >= n


# ── freqz ────────────────────────────────────────────────────────────────────


def test_freqz_matches_scipy():
    h = gf.firwin(51, 0.3).astype(np.float32)
    w, hr, hi = gf.freqz_fir(h, n=256)
    w_ref, h_ref = scipy.signal.freqz(h.astype(np.float64), worN=256)
    np.testing.assert_allclose(w, w_ref, atol=1e-6)
    assert_slice_approx(hr, h_ref.real, 2e-3, "freqz real")
    assert_slice_approx(hi, h_ref.imag, 2e-3, "freqz imag")


def test_freqz_fs_units():
    h = gf.firwin(21, 100.0, fs=1000.0).astype(np.float32)
    w, hr, hi = gf.freqz_fir(h, n=128, fs=1000.0)
    assert w[0] == 0.0 and w[-1] < 500.0
    # Passband gain ~1 at DC, stopband ~0 near Nyquist.
    assert abs(np.hypot(hr[0], hi[0]) - 1.0) < 1e-2
    assert np.hypot(hr[-1], hi[-1]) < 1e-2


def test_firwin_filter_attenuates_stopband(rng):
    # End-to-end: design + apply kills an out-of-band tone.
    t = np.arange(8192, dtype=np.float32)
    lo = np.sin(2 * np.pi * 0.02 * t)
    hi = np.sin(2 * np.pi * 0.35 * t)
    h = gf.firwin(129, 0.2).astype(np.float32)
    y = gf.filtfilt_fir((lo + hi).astype(np.float32), h)
    core = slice(300, -300)
    resid = y[core] - lo[core]
    assert np.abs(resid).max() < 5e-2, f"stopband leak {np.abs(resid).max()}"


# ── fft_convolve2d ───────────────────────────────────────────────────────────


@pytest.mark.parametrize("shape,kshape", [((64, 96), (5, 7)), ((33, 50), (8, 3)), ((17, 17), (17, 17))])
def test_fft_convolve2d_matches_scipy_full(rng, shape, kshape):
    x = rng.standard_normal(shape).astype(np.float32)
    k = rng.standard_normal(kshape).astype(np.float32)
    got = gf.fft_convolve2d(x, k)
    ref = scipy.signal.convolve2d(x.astype(np.float64), k.astype(np.float64))
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"conv2d {shape}x{kshape}")


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
def test_fft_convolve2d_modes_match_scipy(rng, mode):
    x = rng.standard_normal((40, 60)).astype(np.float32)
    k = rng.standard_normal((6, 9)).astype(np.float32)
    got = gf.fft_convolve2d(x, k, mode=mode)
    ref = scipy.signal.convolve2d(x.astype(np.float64), k.astype(np.float64), mode=mode)
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"conv2d mode={mode}")


def test_fft_convolve2d_device_batched(rng):
    x = rng.standard_normal((3, 32, 48)).astype(np.float32)
    k = rng.standard_normal((5, 5)).astype(np.float32)
    out = np.asarray(gf.fft_convolve2d_device(x, k))
    assert out.shape == (3, 36, 52)
    for i in range(3):
        ref = scipy.signal.convolve2d(x[i].astype(np.float64), k.astype(np.float64))
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(out[i] / scale, ref / scale, 2e-3, f"conv2d row {i}")


def test_fft_convolve2d_batched_kernels(rng):
    x = rng.standard_normal((2, 24, 24)).astype(np.float32)
    k = rng.standard_normal((2, 3, 7)).astype(np.float32)
    out = np.asarray(gf.fft_convolve2d_device(x, k))
    for i in range(2):
        ref = scipy.signal.convolve2d(x[i].astype(np.float64), k[i].astype(np.float64))
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(out[i] / scale, ref / scale, 2e-3, f"per-image kernel {i}")


def test_fft_convolve2d_contract_errors(rng):
    with pytest.raises(ValueError):
        gf.fft_convolve2d(np.ones((0, 3), np.float32), np.ones((2, 2), np.float32))
    with pytest.raises(ValueError):
        gf.fft_convolve2d(np.ones((4, 4), np.float32), np.ones((2, 2), np.float32), mode="nope")
    with pytest.raises(ValueError):
        gf.fft_convolve2d(np.ones((2, 2), np.float32), np.ones((4, 4), np.float32), mode="valid")
    with pytest.raises(ValueError):
        gf.fft_convolve2d_device(np.ones((2, 4, 4)), np.ones((3, 2, 2)))


def test_fft_convolve2d_jit_composable(rng):
    import jax

    x = rng.standard_normal((2, 30, 40)).astype(np.float32)
    k = rng.standard_normal((4, 4)).astype(np.float32)
    f = jax.jit(lambda a: gf.fft_convolve2d_device(a, k))
    out = np.asarray(f(x))
    ref = np.asarray(gf.fft_convolve2d_device(x, k))
    assert_slice_approx(out, ref, 1e-5, "conv2d jit vs eager")


# ── kaiser design ────────────────────────────────────────────────────────────


def test_kaiser_helpers_match_scipy():
    for a in (20.0, 40.0, 60.0, 90.0):
        assert abs(gf.kaiser_beta(a) - scipy.signal.kaiser_beta(a)) < 1e-12
    assert abs(gf.kaiser_atten(81, 0.1) - scipy.signal.kaiser_atten(81, 0.1)) < 1e-12
    assert gf.kaiserord(60.0, 0.1) == scipy.signal.kaiserord(60.0, 0.1)
    assert gf.kaiserord(65.0, 0.05) == scipy.signal.kaiserord(65.0, 0.05)
    with pytest.raises(ValueError):
        gf.kaiserord(5.0, 0.1)


def test_firwin_kaiser_matches_scipy():
    numtaps, beta = gf.kaiserord(60.0, 0.1)
    got = gf.firwin(numtaps, 0.3, window=("kaiser", beta))
    ref = scipy.signal.firwin(numtaps, 0.3, window=("kaiser", beta))
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_kaiser_meets_design_attenuation(rng):
    # End-to-end: a kaiserord design reaches its promised stopband floor.
    numtaps, beta = gf.kaiserord(60.0, 0.2)
    h = gf.firwin(numtaps, 0.5, window=("kaiser", beta))
    w, hr, hi = gf.freqz_fir(h.astype(np.float32), n=512)
    mag = np.hypot(hr, hi)
    stop = mag[w / np.pi > 0.5 + 0.1]  # beyond cutoff + half the width
    assert 20 * np.log10(stop.max()) < -58.0, f"stopband {20*np.log10(stop.max()):.1f} dB"


# ── FIRStream ────────────────────────────────────────────────────────────────


@pytest.mark.parametrize("chunk,taps", [(512, 33), (256, 257), (128, 300), (1024, 2)])
def test_firstream_matches_offline(rng, chunk, taps):
    # Concatenated streaming output == offline causal filtering.
    h = rng.standard_normal(taps).astype(np.float32)
    x = rng.standard_normal(8 * chunk).astype(np.float32)
    stream = gf.FIRStream(h, chunk=chunk)
    state = stream.init()
    outs = []
    for i in range(8):
        state, y = stream.step(state, x[i * chunk : (i + 1) * chunk])
        outs.append(np.asarray(y))
    got = np.concatenate(outs)
    ref = scipy.signal.lfilter(h.astype(np.float64), [1.0], x.astype(np.float64))
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"stream c={chunk} t={taps}")


def test_firstream_batched_scan(rng):
    import jax
    from jax import lax

    h = rng.standard_normal(65).astype(np.float32)
    x = rng.standard_normal((3, 10, 512)).astype(np.float32)  # (B, steps, chunk)
    stream = gf.FIRStream(h, chunk=512, batch=3)

    @jax.jit
    def run(xs):
        def body(state, chunk):
            state, y = stream.step(state, chunk)
            return state, y

        _, ys = lax.scan(body, stream.init(), jnp_swap(xs))
        return ys

    import jax.numpy as jnp

    def jnp_swap(a):
        return jnp.swapaxes(jnp.asarray(a), 0, 1)  # scan over steps

    ys = np.asarray(run(x))  # (steps, B, chunk)
    got = np.concatenate([ys[s] for s in range(10)], axis=-1)
    for b in range(3):
        ref = scipy.signal.lfilter(
            h.astype(np.float64), [1.0], x[b].reshape(-1).astype(np.float64)
        )
        scale = max(1.0, np.abs(ref).max())
        assert_slice_approx(got[b] / scale, ref / scale, 2e-3, f"scan stream row {b}")


def test_firstream_contract_errors(rng):
    with pytest.raises(ValueError):
        gf.FIRStream(np.zeros(0, np.float32))
    with pytest.raises(ValueError):
        gf.FIRStream(np.ones(4, np.float32), chunk=0)
    stream = gf.FIRStream(np.ones(4, np.float32), chunk=64)
    with pytest.raises(ValueError):
        stream.step(stream.init(), np.ones(32, np.float32))  # wrong chunk size


# ── minimum_phase ────────────────────────────────────────────────────────────


@pytest.mark.parametrize("taps", [31, 32, 65, 128])
@pytest.mark.parametrize("half", [True, False])
def test_minimum_phase_matches_scipy(taps, half):
    h = gf.firwin(taps, 0.3)
    got = gf.minimum_phase(h, half=half)
    ref = scipy.signal.minimum_phase(h, half=half)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_minimum_phase_is_minimum_phase():
    # All zeros of the result lie inside (or on) the unit circle.
    h = gf.firwin(65, 0.4)
    hm = gf.minimum_phase(h)
    roots = np.roots(hm)
    assert np.abs(roots).max() < 1.0 + 1e-6


def test_minimum_phase_contract_errors():
    with pytest.raises(ValueError):
        gf.minimum_phase(np.ones(1))
    with pytest.raises(ValueError):
        gf.minimum_phase(np.ones(8), n_fft=4)
    with pytest.raises(ValueError):
        gf.minimum_phase(np.ones(8, np.complex128))


# ── code-review regression coverage ──────────────────────────────────────────


@pytest.mark.parametrize("mode", ["same", "valid"])
def test_oaconvolve_modes_scipy_when_kernel_longer(rng, mode):
    # scipy's same-as-in1 / either-operand-valid shapes, NOT numpy's.
    x = rng.standard_normal(10).astype(np.float32)
    h = rng.standard_normal(20).astype(np.float32)
    got = gf.oaconvolve(x, h, mode=mode)
    ref = scipy.signal.oaconvolve(x.astype(np.float64), h.astype(np.float64), mode=mode)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)


@pytest.mark.parametrize("n_fft", [64, 63, 128])
def test_minimum_phase_small_nfft_matches_scipy(n_fft):
    h = gf.firwin(31, 0.3)
    got = gf.minimum_phase(h, n_fft=n_fft)
    ref = scipy.signal.minimum_phase(h, n_fft=n_fft)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin_extended_windows_match_scipy():
    for window in ("flattop", "blackmanharris", "bartlett"):
        got = gf.firwin(65, 0.3, window=window)
        ref = scipy.signal.firwin(65, 0.3, window=window)
        np.testing.assert_allclose(got, ref, atol=1e-12)


def test_freqz_long_filter_folds(rng):
    h = rng.standard_normal(2049).astype(np.float32)  # longer than 2n
    w, hr, hi = gf.freqz_fir(h, n=512)
    w_ref, h_ref = scipy.signal.freqz(h.astype(np.float64), worN=512)
    scale = np.abs(h_ref).max()
    assert_slice_approx(hr / scale, h_ref.real / scale, 2e-3, "freqz folded real")
    assert_slice_approx(hi / scale, h_ref.imag / scale, 2e-3, "freqz folded imag")


def test_spectrogram_accepts_extended_windows(rng):
    x = rng.standard_normal(4096).astype(np.float32)
    p = np.asarray(gf.spectrogram(x, 256, hop=128, window="flattop"))
    assert p.shape == ((4096 - 256) // 128 + 1, 129)
    p2 = np.asarray(gf.spectrogram(x, 256, hop=128, window=("kaiser", 8.6)))
    assert np.isfinite(p2).all()


# ── firwin2 ──────────────────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "numtaps,freq,gain,kw",
    [
        (65, [0.0, 0.3, 0.3, 1.0], [1.0, 1.0, 0.0, 0.0], {}),
        (64, [0.0, 0.3, 0.3, 1.0], [1.0, 1.0, 0.0, 0.0], {}),
        (33, [0.0, 0.5, 1.0], [0.0, 1.0, 0.0], {}),
        (51, [0.0, 0.2, 0.4, 1.0], [1.0, 0.5, 0.25, 0.0], {"window": "hann", "nfreqs": 129}),
        (41, [0.0, 100.0, 100.0, 500.0], [1.0, 1.0, 0.0, 0.0], {"fs": 1000.0}),
        (33, [0.0, 0.3, 0.3, 1.0], [1.0, 1.0, 0.0, 0.0], {"window": ("kaiser", 6.0)}),
        (65, [0.0, 0.1, 0.5, 0.9, 1.0], [0.0, 1.0, 1.0, 1.0, 0.0], {"antisymmetric": True}),
        (64, [0.0, 1.0], [0.0, 1.0], {"antisymmetric": True}),
    ],
)
def test_firwin2_matches_scipy(numtaps, freq, gain, kw):
    got = gf.firwin2(numtaps, freq, gain, **kw)
    ref = scipy.signal.firwin2(numtaps, freq, gain, **kw)
    np.testing.assert_allclose(got, ref, atol=1e-12)


def test_firwin2_contract_errors():
    with pytest.raises(ValueError):
        gf.firwin2(2, [0.0, 1.0], [1.0, 0.0])  # too few taps
    with pytest.raises(ValueError):
        gf.firwin2(33, [0.1, 1.0], [1.0, 0.0])  # must start at 0
    with pytest.raises(ValueError):
        gf.firwin2(33, [0.0, 0.5], [1.0, 0.0])  # must end at fs/2
    with pytest.raises(ValueError):
        gf.firwin2(33, [0.0, 0.6, 0.4, 1.0], [1.0, 1.0, 0.0, 0.0])  # not sorted
    with pytest.raises(ValueError):
        gf.firwin2(33, [0.0, 0.3, 0.3, 0.3, 1.0], [1.0, 1.0, 0.5, 0.0, 0.0])  # triple
    with pytest.raises(ValueError):
        gf.firwin2(64, [0.0, 1.0], [1.0, 1.0])  # even taps need 0 at Nyquist
    with pytest.raises(ValueError):
        gf.firwin2(65, [0.0, 1.0], [1.0, 0.0], antisymmetric=True)  # DC != 0
    with pytest.raises(ValueError):
        gf.firwin2(33, [0.0, 1.0], [1.0, 0.0], nfreqs=16)  # nfreqs < numtaps


def test_firwin2_design_filters(rng):
    # End-to-end: a firwin2 shelving curve actually shapes the spectrum.
    h = gf.firwin2(101, [0.0, 0.25, 0.25, 1.0], [1.0, 1.0, 0.1, 0.1]).astype(np.float32)
    w, hr, hi = gf.freqz_fir(h, n=256)
    mag = np.hypot(hr, hi)
    lo = mag[(w / np.pi) < 0.2].mean()
    hi_band = mag[(w / np.pi) > 0.35].mean()
    assert abs(lo - 1.0) < 0.05 and abs(hi_band - 0.1) < 0.05


# ── fft_correlate2d ──────────────────────────────────────────────────────────


@pytest.mark.parametrize("mode", ["full", "same", "valid"])
@pytest.mark.parametrize("kshape", [(5, 7), (4, 6)])
def test_fft_correlate2d_matches_scipy(rng, mode, kshape):
    x = rng.standard_normal((20, 30)).astype(np.float32)
    k = rng.standard_normal(kshape).astype(np.float32)
    got = gf.fft_correlate2d(x, k, mode=mode)
    ref = scipy.signal.correlate2d(x.astype(np.float64), k.astype(np.float64), mode=mode)
    assert got.shape == ref.shape
    scale = max(1.0, np.abs(ref).max())
    assert_slice_approx(got / scale, ref / scale, 2e-3, f"corr2d {mode} {kshape}")


def test_fft_correlate2d_finds_template(rng):
    # Template matching: the correlation peak localizes an embedded patch.
    img = rng.standard_normal((64, 64)).astype(np.float32)
    tpl = img[20:28, 30:38].copy()
    c = gf.fft_correlate2d(img, tpl - tpl.mean(), mode="valid")
    peak = np.unravel_index(np.argmax(c), c.shape)
    assert peak == (20, 30), f"peak at {peak}"


def test_fft_correlate2d_contract_errors():
    with pytest.raises(ValueError):
        gf.fft_correlate2d(np.ones((2, 2), np.float32), np.ones((4, 4), np.float32),
                           mode="valid")
    with pytest.raises(ValueError):
        gf.fft_correlate2d(np.ones((4, 4), np.float32), np.ones((2, 2), np.float32),
                           mode="nope")


def test_firwin_pass_zero_strings():
    np.testing.assert_allclose(
        gf.firwin(31, 0.3, pass_zero="lowpass"),
        scipy.signal.firwin(31, 0.3, pass_zero="lowpass"), atol=1e-12)
    np.testing.assert_allclose(
        gf.firwin(31, 0.3, pass_zero="highpass"),
        scipy.signal.firwin(31, 0.3, pass_zero="highpass"), atol=1e-12)
    np.testing.assert_allclose(
        gf.firwin(65, [0.2, 0.5], pass_zero="bandpass"),
        scipy.signal.firwin(65, [0.2, 0.5], pass_zero="bandpass"), atol=1e-12)
    np.testing.assert_allclose(
        gf.firwin(65, [0.2, 0.5], pass_zero="bandstop"),
        scipy.signal.firwin(65, [0.2, 0.5], pass_zero="bandstop"), atol=1e-12)
    with pytest.raises(ValueError):
        gf.firwin(31, 0.3, pass_zero="notch")
    with pytest.raises(ValueError):
        gf.firwin(31, [0.2, 0.5], pass_zero="lowpass")
    with pytest.raises(ValueError):
        gf.firwin(31, 0.3, pass_zero="bandpass")
