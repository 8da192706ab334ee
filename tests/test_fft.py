"""Forward-transform tests against analytical spectra.

Mirrors the reference suite ``tests/fft.rs``: impulse, DC, single-bin sine,
zeros, linearity, plus kernel-path coverage by choosing N (direct path
N <= 512, fused four-step 1024..65536, recursive large-N above — the analog
of the reference's dispatch-plan coverage at N = 4096/8192,
``tests/fft.rs:112-169``).
"""

import numpy as np
from conftest import EPSILON, assert_approx, assert_slice_approx

import gpu_fft_tpu as gf


def test_impulse_all_ones():
    # FFT of delta[0] is 1 at every bin (tests/fft.rs:8-21).
    re, im = gf.fft([1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    assert_slice_approx(re, np.ones(8), label="impulse real")
    assert_slice_approx(im, np.zeros(8), label="impulse imag")


def test_dc_component():
    # FFT of all-ones is [N, 0, 0, ...] (tests/fft.rs:23-39).
    n = 16
    re, im = gf.fft(np.ones(n, dtype=np.float32))
    assert_approx(re[0], n, label="DC bin")
    assert_slice_approx(re[1:], np.zeros(n - 1), label="non-DC real")
    assert_slice_approx(im, np.zeros(n), label="DC imag")


def test_single_bin_sine():
    # x[t] = sin(2*pi*t/N)  =>  X[1] = -j*N/2, X[N-1] = +j*N/2
    # (tests/fft.rs:41-76).
    n = 64
    t = np.arange(n)
    x = np.sin(2 * np.pi * t / n).astype(np.float32)
    re, im = gf.fft(x)
    assert_approx(im[1], -n / 2, label="X[1] imag")
    assert_approx(im[n - 1], n / 2, label="X[N-1] imag")
    assert_approx(re[1], 0.0, label="X[1] real")
    mask = np.ones(n, dtype=bool)
    mask[[1, n - 1]] = False
    assert_slice_approx(re[mask], np.zeros(n - 2), label="other real bins")
    assert_slice_approx(im[mask], np.zeros(n - 2), label="other imag bins")


def test_zeros():
    re, im = gf.fft(np.zeros(32, dtype=np.float32))
    assert_slice_approx(re, np.zeros(32), label="zeros real")
    assert_slice_approx(im, np.zeros(32), label="zeros imag")


def test_linearity(rng):
    # FFT(a * x) = a * FFT(x) (tests/fft.rs:87-110).
    x = rng.standard_normal(128).astype(np.float32)
    a = 3.5
    re1, im1 = gf.fft(x)
    re2, im2 = gf.fft(a * x)
    assert_slice_approx(re2, a * re1, eps=EPSILON * 10, label="linearity real")
    assert_slice_approx(im2, a * im1, eps=EPSILON * 10, label="linearity imag")


def test_zero_padding_to_next_power_of_two():
    # 1000 samples pad to 1024 (src/fft.rs:40-41); matches FFT of the
    # explicitly padded signal.
    x = np.sin(np.linspace(0.0, 20.0, 1000)).astype(np.float32)
    re, im = gf.fft(x)
    assert re.shape == (1024,) and im.shape == (1024,)
    padded = np.zeros(1024, dtype=np.float32)
    padded[:1000] = x
    ref = np.fft.fft(padded.astype(np.float64))
    assert_slice_approx(re, ref.real, eps=EPSILON, label="padded real")
    assert_slice_approx(im, ref.imag, eps=EPSILON, label="padded imag")


def test_trivial_lengths():
    # Rust next_power_of_two(0) == 1: empty input gives length-1 zeros
    # (src/fft.rs:44-50).
    re, im = gf.fft([])
    assert re.shape == (1,) and im.shape == (1,)
    assert re[0] == 0.0 and im[0] == 0.0
    re, im = gf.fft([42.0])
    assert re.shape == (1,)
    assert_approx(re[0], 42.0, label="n=1 passthrough")
    assert_approx(im[0], 0.0, label="n=1 imag")


def _analytic_checks(n, eps):
    # Impulse and DC at a given size — the kernel-path coverage pattern
    # (tests/fft.rs:122-169).
    impulse = np.zeros(n, dtype=np.float32)
    impulse[0] = 1.0
    re, im = gf.fft(impulse)
    assert_slice_approx(re, np.ones(n), eps=eps, label=f"impulse real n={n}")
    assert_slice_approx(im, np.zeros(n), eps=eps, label=f"impulse imag n={n}")
    re, im = gf.fft(np.ones(n, dtype=np.float32))
    assert_approx(re[0], n, eps=eps * n, label=f"DC n={n}")
    assert_slice_approx(re[1:], np.zeros(n - 1), eps=eps * n, label=f"DC tail n={n}")


def test_direct_path_sizes():
    for n in (2, 4, 8, 64, 256, 512):
        _analytic_checks(n, EPSILON)


def test_fourstep_path_4096():
    # Balanced four-step (64 x 64) — the reference's "pure radix-4 outer"
    # coverage size (tests/fft.rs:122-135).
    _analytic_checks(4096, EPSILON)


def test_fourstep_path_8192():
    # Unbalanced four-step (64 x 128) — the reference's "radix-4 + trailing
    # radix-2" coverage size (tests/fft.rs:141-153).
    _analytic_checks(8192, EPSILON)


def test_large_path_131072(rng):
    # Above FUSED_MAX: recursive JAX-level factorization (kernels/large.py).
    n = 1 << 17
    x = rng.standard_normal(n).astype(np.float32)
    re, im = gf.fft(x)
    ref = np.fft.fft(x.astype(np.float64))
    scale = np.abs(ref).max()
    assert np.abs(re - ref.real).max() / scale < 1e-5
    assert np.abs(im - ref.imag).max() / scale < 1e-5
