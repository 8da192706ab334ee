"""Spectrogram op tests (batched-transform extension)."""

import numpy as np
import pytest
from conftest import assert_slice_approx

import gpu_fft_tpu as gf
from gpu_fft_tpu.utils import generate_sine_wave


def test_matches_per_frame_fft(rng):
    x = rng.standard_normal(1024).astype(np.float32)
    frame, hop = 256, 128
    spec = gf.spectrogram(x, frame, hop)
    num_frames = (1024 - frame) // hop + 1
    assert spec.shape == (num_frames, frame // 2 + 1)
    for f in range(num_frames):
        seg = x[f * hop : f * hop + frame]
        expected = gf.psd(*gf.fft(seg))[: frame // 2 + 1]
        assert_slice_approx(spec[f], expected, eps=1e-3, label=f"frame {f}")


def test_detects_tone():
    # A 1 kHz tone at 8 kHz sample rate: peak at bin 1000/8000*256 = 32.
    wave = generate_sine_wave(1000.0, 8000.0, 0.5)
    spec = gf.spectrogram(wave, 256)
    peak_bins = np.argmax(spec, axis=1)
    assert np.all(peak_bins == 32)


def test_nonoverlapping_default():
    x = np.zeros(512, np.float32)
    spec = gf.spectrogram(x, 128)
    assert spec.shape == (4, 65)


def test_two_sided():
    x = np.zeros(256, np.float32)
    spec = gf.spectrogram(x, 128, one_sided=False)
    assert spec.shape == (2, 128)


def test_errors():
    with pytest.raises(ValueError):
        gf.spectrogram(np.zeros(100, np.float32), 100)  # non-pow2 frame
    with pytest.raises(ValueError):
        gf.spectrogram(np.zeros(64, np.float32), 128)  # too short
    with pytest.raises(ValueError):
        gf.spectrogram(np.zeros(256, np.float32), 128, hop=0)
    with pytest.raises(ValueError):
        gf.spectrogram(np.zeros((2, 128), np.float32), 64)  # 2-D input


def test_hann_window_reduces_leakage():
    # Off-bin tone: windowed spectrum concentrates energy near the tone.
    n_frame = 256
    t = np.arange(4 * n_frame)
    x = np.sin(2 * np.pi * 10.5 * t / n_frame).astype(np.float32)  # between bins
    rect = gf.spectrogram(x, n_frame)
    hann = gf.spectrogram(x, n_frame, window="hann")
    # Energy more than 3 bins from the tone should drop with the window.
    far = np.ones(n_frame // 2 + 1, dtype=bool)
    far[7:15] = False
    assert hann[0][far].sum() < rect[0][far].sum()


def test_bad_window_rejected():
    with pytest.raises(ValueError):
        gf.spectrogram(np.zeros(256, np.float32), 128, window="rectangular-ish")


def test_spectrogram_window_families(rng):
    import gpu_fft_tpu as gf

    x = rng.uniform(-1.0, 1.0, 2048).astype(np.float32)
    shapes = set()
    for w in (None, "hann", "hamming", "blackman"):
        s = gf.spectrogram(x, 256, window=w)
        shapes.add(s.shape)
        assert np.isfinite(s).all()
    assert len(shapes) == 1
    with pytest.raises(ValueError):
        gf.spectrogram(x, 256, window="kaiser")


# ── spectrogram_scipy (drop-in scipy.signal.spectrogram) ─────────────────────


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"noverlap": 128, "window": "hann"},
        {"nfft": 512},
        {"scaling": "spectrum"},
        {"mode": "magnitude"},
        {"mode": "magnitude", "scaling": "spectrum"},
        {"detrend": "linear"},
    ],
)
def test_spectrogram_scipy_matches_scipy(rng, kw):
    import scipy.signal

    x = rng.standard_normal(8192).astype(np.float32)
    f, t, got = gf.spectrogram_scipy(x, fs=100.0, **kw)
    f_r, t_r, ref = scipy.signal.spectrogram(x.astype(np.float64), fs=100.0, **kw)
    assert got.shape == ref.shape
    np.testing.assert_allclose(f, f_r, atol=1e-9)
    np.testing.assert_allclose(t, t_r, atol=1e-9)
    scale = max(1e-12, np.abs(ref).max())
    assert np.abs(got - ref).max() / scale < 2e-3


def test_spectrogram_scipy_complex_mode(rng):
    import scipy.signal

    x = rng.standard_normal(4096).astype(np.float32)
    f, t, (sr, si) = gf.spectrogram_scipy(x, fs=10.0, mode="complex")
    f_r, t_r, ref = scipy.signal.spectrogram(x.astype(np.float64), fs=10.0, mode="complex")
    assert sr.shape == ref.shape
    scale = np.abs(ref).max()
    assert np.abs(sr + 1j * si - ref).max() / scale < 2e-3


def test_spectrogram_scipy_contract():
    with pytest.raises(ValueError):
        gf.spectrogram_scipy(np.ones(4096, np.float32), mode="angle")
