"""Native C++ backend tests — the reference's FFI-shim coverage pattern
(``tests/parity.rs`` cfg-gated to builds with the mlx feature): skipped when
the shared library isn't built, full parity when it is."""

import pathlib
import subprocess

import numpy as np
import pytest
from conftest import EPSILON, assert_slice_approx

import gpu_fft_tpu as gf
from gpu_fft_tpu import Backend
from gpu_fft_tpu.backends import native

NATIVE_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.is_available():
        try:
            subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            pytest.skip("native backend not built and toolchain unavailable")
        native._load.cache_clear()
        if not native.is_available():
            pytest.skip("native backend build produced no library")


def test_backend_listed():
    assert Backend.NATIVE in gf.available_backends()


def test_forward_parity_vs_xla(rng):
    for n in (8, 256, 1024, 4096):
        x = rng.uniform(-1.0, 1.0, n).astype(np.float32)
        nr, ni = gf.fft_with(x, Backend.NATIVE)
        xr, xi = gf.fft_with(x, Backend.XLA)
        tol = EPSILON * max(1.0, np.sqrt(n) / 4.0)
        assert_slice_approx(nr, xr, eps=tol, label=f"native fwd real n={n}")
        assert_slice_approx(ni, xi, eps=tol, label=f"native fwd imag n={n}")


def test_roundtrip(rng):
    x = rng.uniform(-1.0, 1.0, 1024).astype(np.float32)
    out = gf.ifft(*gf.fft(x, backend=Backend.NATIVE), backend=Backend.NATIVE)
    assert_slice_approx(out[:1024], x, eps=EPSILON, label="native roundtrip")
    assert np.abs(out[1024:]).max() < EPSILON


def test_batch(rng):
    signals = [rng.uniform(-1.0, 1.0, 64).astype(np.float32) for _ in range(8)]
    batch = gf.fft_batch(signals, backend=Backend.NATIVE)
    for s, (br, bi) in zip(signals, batch):
        ref = np.fft.fft(s.astype(np.float64))
        assert_slice_approx(br, ref.real, eps=EPSILON, label="native batch real")
        assert_slice_approx(bi, ref.imag, eps=EPSILON, label="native batch imag")


def test_error_codes():
    # The C ABI rejects invalid shapes with error codes (ffi/mlx_fft.c
    # contract analog); the Python wrapper surfaces them as exceptions.
    with pytest.raises(ValueError):
        native._run(np.zeros((1, 12), np.float32), np.zeros((1, 12), np.float32), -1)


def test_env_gated_default(monkeypatch):
    monkeypatch.setenv("GPU_FFT_TPU_BACKEND", "native")
    assert gf.default_backend() is Backend.NATIVE
