"""Roundtrip tests: ifft(fft(x)) == x within the scaled FFT error bound.

Mirrors reference ``tests/roundtrip.rs``, including its size-scaled tolerance
``5 * log2(N) * f32::EPSILON`` for the large-N cases
(``tests/roundtrip.rs:62-92``) — the accuracy gate the matmul formulation
must meet.
"""

import numpy as np
from conftest import EPSILON, assert_slice_approx

import gpu_fft_tpu as gf

F32_EPS = float(np.finfo(np.float32).eps)


def _roundtrip(x, eps, label):
    x = np.asarray(x, dtype=np.float32)
    n = gf.next_power_of_two(len(x))
    re, im = gf.fft(x)
    out = gf.ifft(re, im)
    assert_slice_approx(out[: len(x)], x, eps=eps, label=f"{label} real")
    assert_slice_approx(
        out[n : n + len(x)], np.zeros(len(x)), eps=eps, label=f"{label} imag"
    )


def test_roundtrip_arbitrary():
    _roundtrip([1.0, 2.5, -0.5, 3.25, 0.0, 1.5, -2.0, 0.75], EPSILON, "arbitrary")


def test_roundtrip_negative():
    _roundtrip([-4.0, -3.0, -2.0, -1.0, 1.0, 2.0, 3.0, 4.0], EPSILON, "negative")


def test_roundtrip_sine():
    t = np.arange(64, dtype=np.float32)
    _roundtrip(np.sin(2 * np.pi * 5 * t / 64), EPSILON, "sine")


def test_roundtrip_padded_input():
    rng = np.random.default_rng(7)
    _roundtrip(rng.standard_normal(1000).astype(np.float32), EPSILON, "padded-1000")


def _scaled_bound(n):
    # tests/roundtrip.rs:63 — 5 * log2(N) * eps.
    return 5.0 * np.log2(n) * F32_EPS


def test_roundtrip_4096_scaled_tolerance(rng):
    n = 4096
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    _roundtrip(x, _scaled_bound(n), "n=4096")


def test_roundtrip_8192_scaled_tolerance(rng):
    n = 8192
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    _roundtrip(x, _scaled_bound(n), "n=8192")


def test_roundtrip_65536_scaled_tolerance(rng):
    # Beyond the reference's largest gated size — same bound formula.
    n = 65536
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    _roundtrip(x, _scaled_bound(n), "n=65536")
