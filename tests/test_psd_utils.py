"""PSD and signal-utility tests — the reference's doc-test coverage
(``src/psd.rs:19-26``, ``src/utils.rs:16-98``) as a real suite."""

import numpy as np
import pytest
from conftest import assert_approx, assert_slice_approx

import gpu_fft_tpu as gf
from gpu_fft_tpu.utils import (
    calculate_frequencies,
    calculate_one_sided_frequencies,
    find_dominant_frequencies,
    generate_sine_wave,
)


def test_psd_values():
    # (re^2 + im^2) / n per bin (src/psd.rs:28-36).
    p = gf.psd([1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 0.0])
    assert p.shape == (4,)
    assert_approx(p[0], 0.25, label="psd[0]")
    assert_slice_approx(p[1:], np.zeros(3), label="psd tail")


def test_psd_mixed():
    p = gf.psd([3.0, 0.0], [4.0, 0.0])
    assert_approx(p[0], (9.0 + 16.0) / 2.0, label="3-4-5 bin")


def test_psd_shape_mismatch():
    with pytest.raises(ValueError):
        gf.psd([1.0, 2.0], [1.0])


def test_generate_sine_wave():
    # 44100 samples for 1 s at 44.1 kHz (src/utils.rs:16-24).
    wave = generate_sine_wave(440.0, 44100.0, 1.0)
    assert wave.shape == (44100,)
    assert wave[0] == 0.0
    assert np.abs(wave).max() <= 1.0 + 1e-6


def test_calculate_frequencies():
    freqs = calculate_frequencies(1024, 44100.0)
    assert freqs.shape == (1024,)
    assert freqs[0] == 0.0
    assert_approx(freqs[1], 44100.0 / 1024.0, eps=1e-3, label="bin 1")


def test_calculate_one_sided_frequencies():
    # n/2 + 1 bins, DC ... Nyquist (src/utils.rs:61-69).
    freqs = calculate_one_sided_frequencies(1000, 200.0)
    assert freqs.shape == (501,)
    assert freqs[0] == 0.0
    assert_approx(freqs[500], 100.0, eps=1e-4, label="Nyquist")


def test_find_dominant_frequencies():
    # Doc example (src/utils.rs:87-98): bins 1 and 3 are peaks above 0.4.
    psd = [0.1, 0.5, 0.3, 0.7, 0.2]
    freqs = [0.0, 100.0, 200.0, 300.0, 400.0]
    dominant = find_dominant_frequencies(psd, freqs, 0.4)
    assert len(dominant) == 2
    assert dominant[0][0] == 100.0
    assert dominant[1][0] == 300.0


def test_find_dominant_endpoints_excluded():
    dominant = find_dominant_frequencies([9.0, 1.0, 9.0], [0.0, 1.0, 2.0], 0.0)
    assert dominant == []


def test_end_to_end_sine_detection():
    # The examples/simple.rs workload (SURVEY §3.5): 15 Hz sine at 200 Hz for
    # 5 s -> 1000 samples -> pad 1024 -> detect ~15.04 Hz peak
    # (README.md:72-85).
    wave = generate_sine_wave(15.0, 200.0, 5.0)
    assert wave.shape == (1000,)
    re, im = gf.fft(wave)
    p = gf.psd(re, im)
    n = len(re)
    bins = n // 2 + 1
    freqs = calculate_one_sided_frequencies(n, 200.0)
    dominant = find_dominant_frequencies(p[:bins], freqs, 100.0)
    assert len(dominant) == 1
    assert abs(dominant[0][0] - 15.04) < 0.05


def test_power_spectrum_device(rng):
    x = rng.standard_normal(256).astype(np.float32)
    p = np.asarray(gf.power_spectrum_device(x))
    ref = gf.psd(*gf.fft(x))[: 256 // 2 + 1]
    assert_slice_approx(p, ref, eps=1e-3, label="fused power spectrum")
