"""Cross-backend parity: PALLAS kernels vs the XLA vendor FFT oracle.

Mirrors the reference's WGPU-vs-MLX parity suite (``tests/parity.rs``): the
same inputs through two independent implementations must agree element-wise,
with tolerances widened with size exactly like the reference
(EPSILON*12 @ 4096, EPSILON*14 @ 16384, ``tests/parity.rs:112-121``).
"""

import numpy as np
import pytest
from conftest import EPSILON, assert_slice_approx

import gpu_fft_tpu as gf
from gpu_fft_tpu import Backend

SIZES = [4, 16, 64, 256, 512, 1024, 2048, 4096, 8192, 16384, 65536]


def _tol(n):
    # Reference widens the tolerance with size; spectra magnitudes grow with
    # N so the comparison is scaled by sqrt(N) here, strictly tighter than
    # the reference's EPSILON*12/EPSILON*14 ladder at its gated sizes.
    return EPSILON * max(1.0, np.sqrt(n) / 4.0)


@pytest.mark.parametrize("n", SIZES)
def test_forward_parity(rng, n):
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    pr, pi = gf.fft_with(x, Backend.PALLAS)
    xr, xi = gf.fft_with(x, Backend.XLA)
    assert_slice_approx(pr, xr, eps=_tol(n), label=f"fwd parity real n={n}")
    assert_slice_approx(pi, xi, eps=_tol(n), label=f"fwd parity imag n={n}")


@pytest.mark.parametrize("n", [16, 256, 1024, 4096, 16384])
def test_inverse_parity(rng, n):
    re = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    im = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    p = gf.ifft_with(re, im, Backend.PALLAS)
    x = gf.ifft_with(re, im, Backend.XLA)
    assert_slice_approx(p, x, eps=EPSILON, label=f"inv parity n={n}")


@pytest.mark.parametrize("n", [1024, 4096])
def test_roundtrip_parity(rng, n):
    # Arbitrary-signal roundtrip through each backend (tests/parity.rs:165).
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    for backend in (Backend.PALLAS, Backend.XLA):
        out = gf.ifft(*gf.fft(x, backend=backend), backend=backend)
        assert_slice_approx(out[:n], x, eps=EPSILON, label=f"{backend} roundtrip")


def test_large_path_parity(rng):
    # Recursive large-N path vs oracle.
    n = 1 << 17
    x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
    pr, pi = gf.fft_with(x, Backend.PALLAS)
    xr, xi = gf.fft_with(x, Backend.XLA)
    assert_slice_approx(pr, xr, eps=_tol(n), label="large fwd real")
    assert_slice_approx(pi, xi, eps=_tol(n), label="large fwd imag")


def test_batch_parity(rng):
    signals = [rng.uniform(-1.0, 1.0, 512).astype(np.float32) for _ in range(8)]
    pal = gf.fft_batch(signals, backend=Backend.PALLAS)
    ora = gf.fft_batch(signals, backend=Backend.XLA)
    for (pr, pi), (xr, xi) in zip(pal, ora):
        assert_slice_approx(pr, xr, eps=_tol(512), label="batch parity real")
        assert_slice_approx(pi, xi, eps=_tol(512), label="batch parity imag")
