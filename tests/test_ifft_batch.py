"""Batched inverse-transform tests (mirrors reference ``tests/ifft_batch.rs``)."""

import numpy as np
import pytest
from conftest import EPSILON, assert_slice_approx

import gpu_fft_tpu as gf


def test_batch_roundtrip(rng):
    # ifft_batch(fft_batch(x)) == x (tests/ifft_batch.rs:12-28).
    signals = [rng.standard_normal(64).astype(np.float32) for _ in range(4)]
    spectra = gf.fft_batch(signals)
    outs = gf.ifft_batch(spectra)
    for s, out in zip(signals, outs):
        n = len(s)
        assert_slice_approx(out[:n], s, eps=EPSILON, label="batch roundtrip real")
        assert_slice_approx(out[n : 2 * n], np.zeros(n), eps=EPSILON, label="imag ~ 0")


def test_batch_matches_scalar_ifft(rng):
    # (tests/ifft_batch.rs:34-50)
    pairs = [
        (rng.standard_normal(32).astype(np.float32), rng.standard_normal(32).astype(np.float32))
        for _ in range(3)
    ]
    outs = gf.ifft_batch(pairs)
    for (r, i), out in zip(pairs, outs):
        assert_slice_approx(out, gf.ifft(r, i), label="batch vs scalar ifft")


def test_all_ones_spectrum_to_impulse():
    # (tests/ifft_batch.rs:56-75)
    n = 16
    outs = gf.ifft_batch([(np.ones(n, np.float32), np.zeros(n, np.float32))] * 2)
    expected = np.zeros(n)
    expected[0] = 1.0
    for out in outs:
        assert_slice_approx(out[:n], expected, label="impulse")


def test_sine_roundtrip():
    # (tests/ifft_batch.rs:80-94)
    n = 128
    t = np.arange(n)
    x = np.sin(2 * np.pi * 3 * t / n).astype(np.float32)
    [out] = gf.ifft_batch(gf.fft_batch([x]))
    assert_slice_approx(out[:n], x, eps=EPSILON, label="sine roundtrip")


def test_empty_batch():
    assert gf.ifft_batch([]) == []


def test_single_pair():
    n = 8
    re = np.zeros(n, np.float32)
    re[0] = n
    [out] = gf.ifft_batch([(re, np.zeros(n, np.float32))])
    assert_slice_approx(out[:n], np.ones(n), label="single DC")


def test_large_batch_64(rng):
    # (tests/ifft_batch.rs:119-135)
    signals = [rng.standard_normal(64).astype(np.float32) for _ in range(64)]
    outs = gf.ifft_batch(gf.fft_batch(signals))
    for s, out in zip(signals, outs):
        assert_slice_approx(out[:64], s, eps=EPSILON, label="large batch roundtrip")


def test_independence():
    # (tests/ifft_batch.rs:141-160)
    n = 32
    dc_spec = np.zeros(n, np.float32)
    dc_spec[0] = n
    flat = np.ones(n, np.float32)
    outs = gf.ifft_batch(
        [(dc_spec, np.zeros(n, np.float32)), (flat, np.zeros(n, np.float32))]
    )
    assert_slice_approx(outs[0][:n], np.ones(n), label="dc signal")
    impulse = np.zeros(n)
    impulse[0] = 1.0
    assert_slice_approx(outs[1][:n], impulse, label="impulse signal")


def test_one_over_n_scaling():
    # Amplitudes {1, 2, 0.5, 10} recover exactly — proves the 1/N pass
    # (tests/ifft_batch.rs:166-180).
    n = 64
    for amp in (1.0, 2.0, 0.5, 10.0):
        x = np.full(n, amp, dtype=np.float32)
        [out] = gf.ifft_batch(gf.fft_batch([x]))
        assert_slice_approx(out[:n], x, eps=EPSILON * amp, label=f"amp={amp}")


def test_rejects_mismatched_batch():
    with pytest.raises(ValueError):
        gf.ifft_batch(
            [
                (np.zeros(8, np.float32), np.zeros(8, np.float32)),
                (np.zeros(16, np.float32), np.zeros(16, np.float32)),
            ]
        )
