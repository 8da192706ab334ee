"""Property-based coverage: random shapes/lengths through the public API
against the NumPy f64 oracle.

The reference's suites are hand-picked analytical cases (SURVEY §4); this
adds a deterministic fuzz sweep over the API surface — ragged lengths,
non-powers of two, odd batch mixes — that hand-picked cases miss.
"""

import numpy as np
from conftest import assert_slice_approx

import gpu_fft_tpu as gf


def test_random_lengths_forward(rng):
    for _ in range(20):
        n_orig = int(rng.integers(1, 3000))
        x = rng.uniform(-2.0, 2.0, n_orig).astype(np.float32)
        re, im = gf.fft(x)
        n = gf.next_power_of_two(n_orig)
        assert re.shape == (n,)
        padded = np.zeros(n)
        padded[:n_orig] = x
        ref = np.fft.fft(padded)
        tol = max(1e-3, 1e-6 * n)
        assert_slice_approx(re, ref.real, eps=tol, label=f"fwd real n_orig={n_orig}")
        assert_slice_approx(im, ref.imag, eps=tol, label=f"fwd imag n_orig={n_orig}")


def test_random_roundtrips(rng):
    for _ in range(12):
        n_orig = int(rng.integers(2, 5000))
        x = rng.uniform(-1.0, 1.0, n_orig).astype(np.float32)
        out = gf.ifft(*gf.fft(x))
        n = gf.next_power_of_two(n_orig)
        bound = max(1e-3, 5.0 * np.log2(n) * float(np.finfo(np.float32).eps))
        assert_slice_approx(out[:n_orig], x, eps=bound, label=f"roundtrip n_orig={n_orig}")


def test_random_ragged_batches(rng):
    for _ in range(6):
        b = int(rng.integers(1, 9))
        signals = [
            rng.uniform(-1.0, 1.0, int(rng.integers(0, 700))).astype(np.float32)
            for _ in range(b)
        ]
        batch = gf.fft_batch(signals)
        assert len(batch) == b
        n = max(1, gf.next_power_of_two(max(len(s) for s in signals)))
        for s, (br, bi) in zip(signals, batch):
            assert br.shape == (n,)
            padded = np.zeros(n)
            padded[: len(s)] = s
            ref = np.fft.fft(padded)
            assert_slice_approx(br, ref.real, eps=1e-3 * max(1, n // 64), label="batch real")
            assert_slice_approx(bi, ref.imag, eps=1e-3 * max(1, n // 64), label="batch imag")


def test_random_complex_inverse(rng):
    for n in (4, 32, 1024):
        re = rng.uniform(-3.0, 3.0, n).astype(np.float32)
        im = rng.uniform(-3.0, 3.0, n).astype(np.float32)
        out = gf.ifft(re, im)
        ref = np.fft.ifft(re.astype(np.float64) + 1j * im.astype(np.float64))
        assert_slice_approx(out[:n], ref.real, eps=1e-3, label=f"inv real n={n}")
        assert_slice_approx(out[n:], ref.imag, eps=1e-3, label=f"inv imag n={n}")


def test_random_exact_lengths(rng):
    # fft_exact at arbitrary (incl. prime) lengths vs the f64 oracle.
    for _ in range(10):
        n = int(rng.integers(2, 4000))
        x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
        re, im = gf.fft_exact(x)
        ref = np.fft.fft(x.astype(np.float64))
        scale = max(1.0, float(np.abs(ref).max()))
        assert re.shape == (n,)
        assert np.abs(re - ref.real).max() / scale < 3e-5, f"n={n}"
        assert np.abs(im - ref.imag).max() / scale < 3e-5, f"n={n}"


def test_random_fft2_shapes(rng):
    for _ in range(6):
        h = 1 << int(rng.integers(1, 8))
        w = 1 << int(rng.integers(1, 8))
        x = rng.uniform(-1.0, 1.0, (h, w)).astype(np.float32)
        re, im = gf.fft2(x)
        ref = np.fft.fft2(x.astype(np.float64))
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(re - ref.real).max() / scale < 1e-5, f"{h}x{w}"
        assert np.abs(im - ref.imag).max() / scale < 1e-5, f"{h}x{w}"


def test_random_mixed_radix_lengths(rng):
    # Composite lengths that ride the mixed-radix four-step (balanced
    # divisor pairings) vs the f64 oracle, including inverse roundtrips.
    from gpu_fft_tpu.ops.exact import mixed_split

    hits = 0
    for _ in range(40):
        n = int(rng.integers(6, 5000))
        if mixed_split(n) is None:
            continue
        hits += 1
        x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
        re, im = gf.fft_exact(x)
        ref = np.fft.fft(x.astype(np.float64))
        scale = max(1.0, float(np.abs(ref).max()))
        assert np.abs(re - ref.real).max() / scale < 3e-5, f"n={n}"
        assert np.abs(im - ref.imag).max() / scale < 3e-5, f"n={n}"
        br, bi = gf.ifft_exact(re, im)
        assert np.abs(br - x).max() < 1e-3, f"n={n} roundtrip"
        if hits >= 12:
            break
    assert hits >= 5  # the sweep must actually exercise the mixed path
