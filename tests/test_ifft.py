"""Inverse-transform tests (mirrors reference ``tests/ifft.rs``)."""

import numpy as np
import pytest
from conftest import EPSILON, assert_slice_approx

import gpu_fft_tpu as gf


def test_dc_spectrum_to_constant():
    # IFFT of [N, 0, ...] is a constant 1.0 signal (tests/ifft.rs:10-22).
    n = 16
    re = np.zeros(n, dtype=np.float32)
    re[0] = n
    out = gf.ifft(re, np.zeros(n, dtype=np.float32))
    assert out.shape == (2 * n,)
    assert_slice_approx(out[:n], np.ones(n), label="constant real")
    assert_slice_approx(out[n:], np.zeros(n), label="constant imag")


def test_flat_spectrum_to_impulse():
    # IFFT of all-ones is delta[0] (tests/ifft.rs:27-40).
    n = 32
    out = gf.ifft(np.ones(n, dtype=np.float32), np.zeros(n, dtype=np.float32))
    expected = np.zeros(n)
    expected[0] = 1.0
    assert_slice_approx(out[:n], expected, label="impulse")
    assert_slice_approx(out[n:], np.zeros(n), label="impulse imag")


def test_linearity(rng):
    # IFFT(a * X) = a * IFFT(X) (tests/ifft.rs:43-63).
    n = 64
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    a = 2.5
    out1 = gf.ifft(xr, xi)
    out2 = gf.ifft(a * xr, a * xi)
    assert_slice_approx(out2, a * out1, eps=EPSILON * 10, label="ifft linearity")


def test_rejects_non_power_of_two():
    # API contract: feed fft output unchanged (src/ifft.rs:44-53).
    with pytest.raises(ValueError):
        gf.ifft(np.zeros(12, np.float32), np.zeros(12, np.float32))


def test_rejects_mismatched_lengths():
    with pytest.raises(ValueError):
        gf.ifft(np.zeros(8, np.float32), np.zeros(16, np.float32))


def test_rejects_empty():
    # Rust: 0.is_power_of_two() is false -> panic (src/ifft.rs:50-53).
    with pytest.raises(ValueError):
        gf.ifft([], [])


def test_length_one_passthrough():
    out = gf.ifft([7.0], [3.0])
    assert out.shape == (2,)
    assert out[0] == 7.0 and out[1] == 3.0
